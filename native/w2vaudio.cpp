// w2vaudio — native audio decoding runtime for wav2vec_contr_loss_tpu.
//
// The reference's input pipeline decodes every clip with librosa in Python
// workers (reference: base_audio.py:21-47) — the host-side bottleneck that
// caps TPU feed rate (SURVEY.md §7 hard part #5). This library decodes
// WAV (PCM 8/16/24/32 + float32) and native FLAC to mono float32 with zero
// Python in the loop, plus a pthread batch API for parallel decode.
//
// Exposed C ABI (ctypes-friendly):
//   long long w2v_decode_audio(const char* path, float* out,
//                              long long capacity, int* sample_rate);
//     -> sample count, or -1 open / -2 format / -3 capacity error.
//   void w2v_decode_batch(const char** paths, int n, float* out,
//                         long long target_len, int* sample_rates,
//                         long long* lengths, int n_threads);
//     -> decodes n files concurrently; each row of `out` (n x target_len)
//        is zero-padded/truncated to target_len (pad/trim contract of
//        base_audio.py:39-45); lengths[i] < 0 on per-file failure.
//
// FLAC: full subset decode — constant/verbatim/fixed(0-4)/LPC subframes,
// rice + rice2 residual partitions with escape codes, wasted bits,
// left/right/mid-side decorrelation, 8-32 bps. CRCs are not verified
// (corrupted files surface as decode errors and map to the zero-waveform
// fallback upstream).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <pthread.h>
#include <vector>

namespace {

// ------------------------------------------------------------ bit reader
struct BitReader {
    const uint8_t* data;
    size_t size;
    size_t byte_pos = 0;
    int bit_pos = 0;  // 0..7, MSB first
    bool error = false;

    BitReader(const uint8_t* d, size_t s) : data(d), size(s) {}

    inline uint32_t bit() {
        if (byte_pos >= size) { error = true; return 0; }
        uint32_t b = (data[byte_pos] >> (7 - bit_pos)) & 1u;
        if (++bit_pos == 8) { bit_pos = 0; ++byte_pos; }
        return b;
    }

    uint64_t bits(int n) {  // n <= 57
        uint64_t v = 0;
        while (n > 0 && !error) {
            if (bit_pos == 0 && n >= 8 && byte_pos < size) {
                v = (v << 8) | data[byte_pos++];
                n -= 8;
            } else {
                v = (v << 1) | bit();
                --n;
            }
        }
        return v;
    }

    int64_t sbits(int n) {  // signed, two's complement
        uint64_t v = bits(n);
        if (n > 0 && (v >> (n - 1)) & 1u) v |= ~((1ull << n) - 1);
        return (int64_t)v;
    }

    uint32_t unary() {
        uint32_t q = 0;
        while (!error && bit() == 0) ++q;
        return q;
    }

    void align() { if (bit_pos) { bit_pos = 0; ++byte_pos; } }
};

// ----------------------------------------------------------- file slurp
bool read_file(const char* path, std::vector<uint8_t>& buf) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    if (n <= 0) { fclose(f); return false; }
    fseek(f, 0, SEEK_SET);
    buf.resize((size_t)n);
    size_t got = fread(buf.data(), 1, (size_t)n, f);
    fclose(f);
    return got == (size_t)n;
}

// ------------------------------------------------------------------ WAV
long long decode_wav(const std::vector<uint8_t>& b, float* out,
                     long long cap, int* sample_rate) {
    if (b.size() < 44 || memcmp(b.data(), "RIFF", 4) || memcmp(b.data() + 8, "WAVE", 4))
        return -2;
    size_t pos = 12;
    int fmt = 0, channels = 0, bps = 0, sub_format = 0;
    uint32_t rate = 0;
    const uint8_t* pcm = nullptr;
    size_t pcm_size = 0;
    while (pos + 8 <= b.size()) {
        const uint8_t* p = b.data() + pos;
        uint32_t sz;
        memcpy(&sz, p + 4, 4);
        if (!memcmp(p, "fmt ", 4) && sz >= 16) {
            fmt = p[8] | (p[9] << 8);
            channels = p[10] | (p[11] << 8);
            memcpy(&rate, p + 12, 4);
            bps = p[22] | (p[23] << 8);
            // WAVE_FORMAT_EXTENSIBLE: the real format code is the first two
            // bytes of the SubFormat GUID at offset 24 of the fmt chunk
            if (fmt == 0xFFFE && sz >= 40 && pos + 8 + 26 <= b.size())
                sub_format = p[8 + 24] | (p[8 + 25] << 8);
        } else if (!memcmp(p, "data", 4)) {
            pcm = p + 8;
            pcm_size = sz;
            if (pos + 8 + pcm_size > b.size()) pcm_size = b.size() - pos - 8;
            break;
        }
        pos += 8 + sz + (sz & 1);
    }
    if (!pcm || channels <= 0 || rate == 0) return -2;
    if (fmt == 0xFFFE) {
        // resolve extensible to its SubFormat (1 = PCM, 3 = IEEE float);
        // anything else (ALAW, GUID missing/truncated, ...) is unsupported
        if (sub_format != 1 && sub_format != 3) return -2;
        fmt = sub_format;
    }
    if (fmt != 1 && fmt != 3) return -2;
    if (fmt == 3 && bps != 32) return -2;  // only float32 (no float64)

    int bytes = bps / 8;
    if (bytes < 1 || bytes > 4) return -2;
    long long frames = (long long)(pcm_size / (size_t)(bytes * channels));
    if (frames > cap) return -3;
    const bool is_float = (fmt == 3);
    for (long long i = 0; i < frames; ++i) {
        double acc = 0.0;
        for (int c = 0; c < channels; ++c) {
            const uint8_t* s = pcm + (size_t)(i * channels + c) * bytes;
            double v = 0.0;
            if (is_float && bytes == 4) {
                float fv;
                memcpy(&fv, s, 4);
                v = fv;
            } else if (bytes == 1) {
                v = ((int)s[0] - 128) / 128.0;
            } else if (bytes == 2) {
                int16_t x;
                memcpy(&x, s, 2);
                v = x / 32768.0;
            } else if (bytes == 3) {
                int32_t x = s[0] | (s[1] << 8) | (s[2] << 16);
                if (x & 0x800000) x |= ~0xFFFFFF;
                v = x / 8388608.0;
            } else {
                int32_t x;
                memcpy(&x, s, 4);
                v = x / 2147483648.0;
            }
            acc += v;
        }
        out[i] = (float)(acc / channels);
    }
    *sample_rate = (int)rate;
    return frames;
}

// ----------------------------------------------------------------- FLAC
struct FlacInfo {
    uint32_t sample_rate = 0;
    int channels = 0;
    int bps = 0;
    uint64_t total_samples = 0;
};

bool decode_subframe(BitReader& br, int32_t* x, int n, int bps) {
    if (br.bit() != 0) return false;  // mandatory zero pad bit
    uint32_t type = (uint32_t)br.bits(6);
    int wasted = 0;
    if (br.bit()) wasted = 1 + (int)br.unary();
    if (wasted > 30) return false;  // adversarial streams: avoid shift UB
    bps -= wasted;
    if (bps <= 0 || bps > 33) return false;

    int order = 0;
    bool is_lpc = false, is_fixed = false;
    if (type == 0) {  // constant
        int64_t v = br.sbits(bps);
        for (int i = 0; i < n; ++i) x[i] = (int32_t)v;
    } else if (type == 1) {  // verbatim
        for (int i = 0; i < n; ++i) x[i] = (int32_t)br.sbits(bps);
    } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {
        is_fixed = true;
        order = type & 0x07;
    } else if (type & 0x20) {
        is_lpc = true;
        order = (int)(type & 0x1F) + 1;
    } else {
        return false;
    }

    int32_t qcoef[32];
    int shift = 0, precision = 0;
    if (is_fixed || is_lpc) {
        if (order > n) return false;
        for (int i = 0; i < order; ++i) x[i] = (int32_t)br.sbits(bps);
        if (is_lpc) {
            precision = (int)br.bits(4);
            if (precision == 15) return false;
            precision += 1;
            shift = (int)br.sbits(5);
            if (shift < 0) return false;
            for (int i = 0; i < order; ++i)
                qcoef[i] = (int32_t)br.sbits(precision);
        }
        // residual
        uint32_t method = (uint32_t)br.bits(2);
        if (method > 1) return false;
        int plen = method == 0 ? 4 : 5;
        uint32_t escape = method == 0 ? 0xF : 0x1F;
        int porder = (int)br.bits(4);
        int parts = 1 << porder;
        if ((n >> porder) == 0 || (n % parts) != 0) return false;
        // libFLAC validation: the first partition holds (n>>porder) - order
        // samples; order greater than that would make its count negative and
        // later partitions would write past x[n] (heap overflow on a
        // crafted/corrupted stream).
        if (order > (n >> porder)) return false;
        int idx = order;
        for (int p = 0; p < parts; ++p) {
            int count = (n >> porder) - (p == 0 ? order : 0);
            uint32_t param = (uint32_t)br.bits(plen);
            if (param == escape) {
                int raw = (int)br.bits(5);
                for (int i = 0; i < count; ++i)
                    x[idx++] = raw ? (int32_t)br.sbits(raw) : 0;
            } else {
                for (int i = 0; i < count; ++i) {
                    uint32_t q = br.unary();
                    uint64_t r = br.bits((int)param);
                    uint64_t v = ((uint64_t)q << param) | r;
                    x[idx++] = (int32_t)((v >> 1) ^ (~(v & 1) + 1));
                }
            }
            if (br.error) return false;
        }
        // prediction
        if (is_fixed) {
            switch (order) {
                case 0: break;
                case 1:
                    for (int i = 1; i < n; ++i) x[i] += x[i - 1];
                    break;
                case 2:
                    for (int i = 2; i < n; ++i)
                        x[i] += 2 * x[i - 1] - x[i - 2];
                    break;
                case 3:
                    for (int i = 3; i < n; ++i)
                        x[i] += 3 * x[i - 1] - 3 * x[i - 2] + x[i - 3];
                    break;
                case 4:
                    for (int i = 4; i < n; ++i)
                        x[i] += 4 * x[i - 1] - 6 * x[i - 2] + 4 * x[i - 3] - x[i - 4];
                    break;
            }
        } else {
            for (int i = order; i < n; ++i) {
                int64_t acc = 0;
                for (int j = 0; j < order; ++j)
                    acc += (int64_t)qcoef[j] * x[i - 1 - j];
                x[i] += (int32_t)(acc >> shift);
            }
        }
    }
    if (wasted)
        for (int i = 0; i < n; ++i) x[i] = (int32_t)((uint32_t)x[i] << wasted);
    return !br.error;
}

long long decode_flac(const std::vector<uint8_t>& b, float* out,
                      long long cap, int* sample_rate) {
    if (b.size() < 42 || memcmp(b.data(), "fLaC", 4)) return -2;
    size_t pos = 4;
    FlacInfo info;
    bool have_info = false;
    // metadata blocks
    while (pos + 4 <= b.size()) {
        uint8_t hdr = b[pos];
        uint32_t len = (b[pos + 1] << 16) | (b[pos + 2] << 8) | b[pos + 3];
        pos += 4;
        if ((hdr & 0x7F) == 0 && len >= 34 && pos + 34 <= b.size()) {
            const uint8_t* s = b.data() + pos;
            info.sample_rate = ((uint32_t)s[10] << 12) | ((uint32_t)s[11] << 4) |
                               (s[12] >> 4);
            info.channels = ((s[12] >> 1) & 0x7) + 1;
            info.bps = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1;
            info.total_samples = ((uint64_t)(s[13] & 0x0F) << 32) |
                                 ((uint64_t)s[14] << 24) | ((uint64_t)s[15] << 16) |
                                 ((uint64_t)s[16] << 8) | s[17];
            have_info = true;
        }
        pos += len;
        if (hdr & 0x80) break;  // last metadata block
    }
    if (!have_info || info.sample_rate == 0 || info.channels < 1 ||
        info.channels > 8 || pos >= b.size())
        return -2;

    BitReader br(b.data() + pos, b.size() - pos);
    std::vector<std::vector<int32_t>> ch(info.channels);
    long long written = 0;
    const double scale = 1.0 / (double)(1u << (info.bps - 1));

    while (!br.error && br.byte_pos < br.size) {
        // frame sync
        uint32_t sync = (uint32_t)br.bits(14);
        if (br.error) break;
        if (sync != 0x3FFE) return written > 0 ? written : -2;
        br.bit();                       // reserved
        br.bit();                       // blocking strategy
        uint32_t bs_code = (uint32_t)br.bits(4);
        uint32_t sr_code = (uint32_t)br.bits(4);
        uint32_t ch_code = (uint32_t)br.bits(4);
        uint32_t ss_code = (uint32_t)br.bits(3);
        br.bit();                       // reserved
        // UTF-8 coded frame/sample number
        uint32_t first = (uint32_t)br.bits(8);
        int extra = 0;
        for (uint32_t m = 0x80; first & m; m >>= 1) ++extra;
        if (extra) extra -= 1;
        for (int i = 0; i < extra; ++i) br.bits(8);

        int block_size;
        if (bs_code == 1) block_size = 192;
        else if (bs_code >= 2 && bs_code <= 5) block_size = 576 << (bs_code - 2);
        else if (bs_code == 6) block_size = (int)br.bits(8) + 1;
        else if (bs_code == 7) block_size = (int)br.bits(16) + 1;
        else if (bs_code >= 8) block_size = 256 << (bs_code - 8);
        else return written > 0 ? written : -2;

        if (sr_code == 12) br.bits(8);
        else if (sr_code == 13 || sr_code == 14) br.bits(16);

        int bps = info.bps;
        switch (ss_code) {
            case 0: break;
            case 1: bps = 8; break;
            case 2: bps = 12; break;
            case 4: bps = 16; break;
            case 5: bps = 20; break;
            case 6: bps = 24; break;
            case 7: bps = 32; break;
            default: return written > 0 ? written : -2;
        }
        br.bits(8);  // CRC-8

        int nch = info.channels;
        bool left_side = false, right_side = false, mid_side = false;
        if (ch_code <= 7) nch = (int)ch_code + 1;
        else if (ch_code == 8) { nch = 2; left_side = true; }
        else if (ch_code == 9) { nch = 2; right_side = true; }
        else if (ch_code == 10) { nch = 2; mid_side = true; }
        else return written > 0 ? written : -2;

        for (int c = 0; c < nch; ++c) {
            if ((int)ch[c].size() < block_size) ch[c].resize(block_size);
            int sub_bps = bps;
            if ((left_side && c == 1) || (right_side && c == 0) ||
                (mid_side && c == 1))
                sub_bps += 1;
            if (!decode_subframe(br, ch[c].data(), block_size, sub_bps))
                return written > 0 ? written : -2;
        }
        br.align();
        br.bits(16);  // CRC-16

        // stereo decorrelation
        if (left_side) {
            for (int i = 0; i < block_size; ++i)
                ch[1][i] = ch[0][i] - ch[1][i];
        } else if (right_side) {
            for (int i = 0; i < block_size; ++i)
                ch[0][i] = ch[0][i] + ch[1][i];
        } else if (mid_side) {
            for (int i = 0; i < block_size; ++i) {
                int32_t side = ch[1][i];
                int64_t mid = ((int64_t)ch[0][i] << 1) | (side & 1);
                ch[0][i] = (int32_t)((mid + side) >> 1);
                ch[1][i] = (int32_t)((mid - side) >> 1);
            }
        }

        for (int i = 0; i < block_size; ++i) {
            if (written >= cap) return -3;
            double acc = 0.0;
            for (int c = 0; c < nch; ++c) acc += ch[c][i] * scale;
            out[written++] = (float)(acc / nch);
        }
        if (info.total_samples && (uint64_t)written >= info.total_samples) break;
    }
    *sample_rate = (int)info.sample_rate;
    return written;
}

}  // namespace

extern "C" {

int w2v_version() { return 1; }

long long w2v_decode_audio(const char* path, float* out, long long capacity,
                           int* sample_rate) {
    std::vector<uint8_t> buf;
    if (!read_file(path, buf)) return -1;
    if (buf.size() >= 4 && !memcmp(buf.data(), "fLaC", 4))
        return decode_flac(buf, out, capacity, sample_rate);
    if (buf.size() >= 4 && !memcmp(buf.data(), "RIFF", 4))
        return decode_wav(buf, out, capacity, sample_rate);
    return -2;
}

struct BatchJob {
    const char** paths;
    float* out;
    long long target_len;
    int* sample_rates;
    long long* lengths;
    int n;
    int stride;
    int offset;
};

static void* batch_worker(void* arg) {
    BatchJob* job = (BatchJob*)arg;
    std::vector<float> tmp;
    for (int i = job->offset; i < job->n; i += job->stride) {
        long long cap = job->target_len * 16;  // decode headroom before trim
        if ((long long)tmp.size() < cap) tmp.resize(cap);
        int sr = 0;
        long long n = w2v_decode_audio(job->paths[i], tmp.data(), cap, &sr);
        float* row = job->out + (long long)i * job->target_len;
        memset(row, 0, sizeof(float) * (size_t)job->target_len);
        if (n > 0) {
            long long copy = n < job->target_len ? n : job->target_len;
            memcpy(row, tmp.data(), sizeof(float) * (size_t)copy);
        }
        job->sample_rates[i] = sr;
        job->lengths[i] = n;
    }
    return nullptr;
}

void w2v_decode_batch(const char** paths, int n, float* out,
                      long long target_len, int* sample_rates,
                      long long* lengths, int n_threads) {
    if (n_threads < 1) n_threads = 1;
    if (n_threads > n) n_threads = n > 0 ? n : 1;
    std::vector<pthread_t> threads((size_t)n_threads);
    std::vector<BatchJob> jobs((size_t)n_threads);
    for (int t = 0; t < n_threads; ++t) {
        jobs[t] = BatchJob{paths, out, target_len, sample_rates, lengths,
                           n, n_threads, t};
        pthread_create(&threads[t], nullptr, batch_worker, &jobs[t]);
    }
    for (int t = 0; t < n_threads; ++t) pthread_join(threads[t], nullptr);
}

}  // extern "C"

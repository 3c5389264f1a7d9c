"""Native decoder fuzzing: adversarial bitstreams must return error codes,
never crash. Runs in a subprocess so a segfault fails the test instead of
killing pytest."""

import os
import subprocess
import sys

import pytest

SO_PATH = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "native", "libw2vaudio.so")
)

FUZZ_SCRIPT = r"""
import ctypes, sys
import numpy as np

lib = ctypes.CDLL(sys.argv[1])
lib.w2v_decode_audio.restype = ctypes.c_longlong
lib.w2v_decode_audio.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
    ctypes.POINTER(ctypes.c_int),
]
tmp = sys.argv[2]
rng = np.random.default_rng(0)
buf = np.zeros(200000, np.float32)
sr = ctypes.c_int(0)

def decode(path):
    return lib.w2v_decode_audio(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size, ctypes.byref(sr))

# 1) random garbage with valid magics
for trial in range(40):
    data = rng.integers(0, 256, rng.integers(20, 4000), dtype=np.uint8).tobytes()
    for magic in (b"fLaC", b"RIFF"):
        p = f"{tmp}/f{trial}_{magic.decode()}.bin"
        open(p, "wb").write(magic + data)
        n = decode(p)
        assert n <= 0 or n < buf.size, n

# 2) bit-flipped / truncated real FLAC files
sys.path.insert(0, sys.argv[3])
from tests.flac_writer import write_flac
x = (0.3 * 32767 * np.sin(2*np.pi*440*np.arange(8000)/16000)).astype(np.int16)
good = f"{tmp}/good.flac"
write_flac(good, x)
raw = bytearray(open(good, "rb").read())
for trial in range(60):
    mutated = bytearray(raw)
    for _ in range(rng.integers(1, 6)):
        mutated[rng.integers(8, len(mutated))] ^= 1 << rng.integers(0, 8)
    p = f"{tmp}/mut{trial}.flac"
    open(p, "wb").write(bytes(mutated))
    decode(p)  # any return value OK; must not crash
for trial in range(20):
    p = f"{tmp}/trunc{trial}.flac"
    open(p, "wb").write(bytes(raw[: rng.integers(4, len(raw))]))
    decode(p)
print("FUZZ_OK")
"""


def test_fuzz_decoder_never_crashes(tmp_path):
    if not os.path.exists(SO_PATH):
        pytest.skip("native decoder not built")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", FUZZ_SCRIPT, SO_PATH, str(tmp_path), repo_root],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, f"fuzz crashed: rc={proc.returncode}\n{proc.stderr[-2000:]}"
    assert "FUZZ_OK" in proc.stdout

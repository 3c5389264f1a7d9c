"""Protocol parsers and dataset objects for every corpus the reference
supports (reference: data_loader.py:29-435).

Each parser returns a `SpoofDataset`: an ordered list of `Utterance`
records plus an `AudioLoader`. Datasets are plain Python objects (no torch
Dataset machinery) — batching happens in `pipeline.py`, which assembles
fixed-shape numpy arrays for the TPU.

Label conventions (same as reference): binary 1 = bonafide, 0 = spoof;
multi-class attack ids are assigned in file order with bonafide = 0
(reference: data_loader.py:148, 179-188).
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from .audio import AudioConfig, AudioLoader

__all__ = [
    "Utterance",
    "SpoofDataset",
    "parse_asvspoof2019",
    "parse_in_the_wild",
    "parse_famous_figures",
    "parse_asvspoof2021",
    "parse_ravdess",
    "parse_common_voice",
]


@dataclass(frozen=True)
class Utterance:
    path: str
    label: int                 # 1 = bonafide, 0 = spoof
    multi_label: int = 0       # attack-id class (bonafide = 0)
    speaker: str = "unknown"
    source: str = "NA"
    name: str = ""             # audio file name (utt id for scoring)


class SpoofDataset:
    """An ordered utterance list + audio loader. Indexing decodes audio to a
    fixed-length float32 waveform; label metadata is available without
    decoding via `.utterances`."""

    def __init__(
        self,
        utterances: Sequence[Utterance],
        audio: AudioConfig = AudioConfig(),
        attack_to_idx: Optional[Dict[str, int]] = None,
        name: str = "dataset",
    ):
        if not utterances:
            raise RuntimeError(f"{name}: no utterances after filtering")
        self.utterances: List[Utterance] = list(utterances)
        self.audio_config = audio
        self.loader = AudioLoader(audio)
        self.attack_to_idx = dict(attack_to_idx or {"bonafide": 0})
        self.name = name

    def __len__(self) -> int:
        return len(self.utterances)

    def __getitem__(self, idx: int):
        utt = self.utterances[idx]
        return self.loader.load(utt.path), utt

    @property
    def labels(self) -> np.ndarray:
        return np.array([u.label for u in self.utterances], dtype=np.int32)

    @property
    def multi_labels(self) -> np.ndarray:
        return np.array([u.multi_label for u in self.utterances], dtype=np.int32)

    def subset_indices(self, subset: str) -> np.ndarray:
        labels = self.labels
        if subset == "bonafide":
            return np.nonzero(labels == 1)[0]
        if subset == "spoof":
            return np.nonzero(labels == 0)[0]
        return np.arange(len(self))


def _apply_subset(utts: List[Utterance], subset: str) -> List[Utterance]:
    subset = (subset or "all").lower()
    if subset not in ("all", "bonafide", "spoof"):
        raise ValueError(f"subset must be all|bonafide|spoof, got {subset}")
    if subset == "bonafide":
        return [u for u in utts if u.label == 1]
    if subset == "spoof":
        return [u for u in utts if u.label == 0]
    return utts


def _subsample(utts: List[Utterance], num_samples: Optional[int], seed: int) -> List[Utterance]:
    """Seeded random subset without replacement
    (reference: data_loader.py:193-196)."""
    if num_samples is None or len(utts) <= num_samples:
        return utts
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(utts))[: int(num_samples)]
    return [utts[i] for i in idx]


def _norm_label(s: str) -> str:
    return str(s).strip().lower().replace("bona-fide", "bonafide")


def parse_asvspoof2019(
    protocol_file: str,
    root_dir: str = "",
    subset: str = "all",
    num_samples: Optional[int] = None,
    sample_seed: int = 1337,
    audio: AudioConfig = AudioConfig(),
) -> SpoofDataset:
    """ASVspoof2019-LA 5-column protocol:
    ``<path> <attackID> <label> <_> <speaker>`` with attackID '-' for
    bonafide (reference: data_loader.py:135-216). The multi-class attack map
    is built in file order, seeded with {'bonafide': 0}.
    """
    root = Path(root_dir)
    attack_to_idx: Dict[str, int] = {"bonafide": 0}
    utts: List[Utterance] = []
    with open(protocol_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 5:
                continue
            rel, attack_raw, label_str, speaker = parts[0], parts[1], _norm_label(parts[2]), parts[4]
            fname = rel.split("/")[-1]
            label = 1 if label_str == "bonafide" else 0
            key = "bonafide" if label == 1 else attack_raw
            if key not in attack_to_idx:
                attack_to_idx[key] = len(attack_to_idx)
            utts.append(
                Utterance(
                    path=str(root / fname),
                    label=label,
                    multi_label=attack_to_idx[key],
                    speaker=speaker,
                    name=fname,
                )
            )
    utts = _apply_subset(utts, subset)
    utts = _subsample(utts, num_samples, sample_seed)
    return SpoofDataset(utts, audio, attack_to_idx, name="asvspoof2019")


def parse_in_the_wild(
    protocol_file: str,
    root_dir: str = "",
    subset: str = "all",
    num_samples: Optional[int] = None,
    sample_seed: int = 42,
    audio: AudioConfig = AudioConfig(),
    filter_missing: bool = True,
) -> SpoofDataset:
    """In-The-Wild CSV protocol (columns file,speaker,label); normalizes
    'bona-fide' -> 'bonafide' and drops rows whose audio is missing
    (reference: data_loader.py:361-435)."""
    import pandas as pd

    df = pd.read_csv(protocol_file)
    df["label"] = df["label"].map(_norm_label)
    root = Path(root_dir)
    utts: List[Utterance] = []
    n_missing = 0
    for _, row in df.iterrows():
        p = root / str(row["file"])
        if filter_missing and not p.exists():
            n_missing += 1
            continue
        utts.append(
            Utterance(
                path=str(p),
                label=1 if row["label"] == "bonafide" else 0,
                speaker=str(row.get("speaker", "unknown")),
                name=Path(str(row["file"])).name,
            )
        )
    if n_missing:
        print(f"[INFO] InTheWild: filtered out {n_missing} missing audio files.")
    utts = _apply_subset(utts, subset)
    utts = _subsample(utts, num_samples, sample_seed)
    return SpoofDataset(utts, audio, name="in_the_wild")


def parse_famous_figures(
    protocol_file: str,
    root_dir: str = "",
    subset: str = "all",
    include_speakers: Optional[Sequence[str]] = None,
    include_sources: Optional[Sequence[str]] = None,
    num_samples: Optional[int] = None,
    sample_seed: int = 42,
    audio: AudioConfig = AudioConfig(),
    filter_missing: bool = True,
) -> SpoofDataset:
    """FamousFigures TSV protocol (AudioName, Speaker, Source, Label,
    AudioPath) with path cleaning (truncate after '.wav'), root joining,
    speaker/source allowlists, and existence filtering
    (reference: data_loader.py:29-133)."""
    import pandas as pd

    try:
        df = pd.read_csv(protocol_file, sep="\t")
    except Exception:
        df = pd.read_csv(protocol_file, sep=r"\s+", engine="python")
    expected = {"AudioName", "Speaker", "Source", "Label", "AudioPath"}
    missing_cols = expected - set(df.columns)
    if missing_cols:
        raise ValueError(f"Protocol is missing columns: {sorted(missing_cols)}")

    def clean(p: str) -> str:
        s = str(p)
        i = s.lower().find(".wav")
        return s[: i + 4] if i >= 0 else s

    root = Path(root_dir) if root_dir else None
    utts: List[Utterance] = []
    n_missing = 0
    spk_keep = set(map(str, include_speakers)) if include_speakers else None
    src_keep = set(map(str, include_sources)) if include_sources else None
    for _, row in df.iterrows():
        speaker, source = str(row["Speaker"]), str(row["Source"])
        if spk_keep is not None and speaker not in spk_keep:
            continue
        if src_keep is not None and source not in src_keep:
            continue
        p = Path(clean(row["AudioPath"]))
        if root is not None and not p.is_absolute():
            p = root / p
        if filter_missing and not p.exists():
            n_missing += 1
            continue
        utts.append(
            Utterance(
                path=str(p),
                label=1 if _norm_label(row["Label"]) == "bonafide" else 0,
                speaker=speaker,
                source=source,
                name=Path(str(row["AudioName"])).name or p.name,
            )
        )
    if n_missing:
        print(f"[INFO] FamousFigures: filtered out {n_missing} missing audio files.")
    utts = _apply_subset(utts, subset)
    utts = _subsample(utts, num_samples, sample_seed)
    return SpoofDataset(utts, audio, name="famous_figures")


def parse_asvspoof2021(
    root_dir: str,
    ok_files: str,
    protocol_file: str,
    subset: str = "all",
    num_samples: Optional[int] = None,
    sample_seed: int = 42,
    audio: AudioConfig = AudioConfig(),
) -> SpoofDataset:
    """ASVspoof2021-DF eval: flac files under <root>/flac filtered by the
    stems in ok_files.txt against the 13-column protocol
    (reference: data_loader.py:312-359)."""
    with open(ok_files) as f:
        ok = {Path(line.strip()).stem for line in f if line.strip()}
    flac_dir = Path(root_dir) / "flac"
    utts: List[Utterance] = []
    with open(protocol_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 6:
                continue
            speaker, fname, label_str = parts[0], parts[1], _norm_label(parts[5])
            if fname not in ok:
                continue
            utts.append(
                Utterance(
                    path=str(flac_dir / f"{fname}.flac"),
                    label=1 if label_str == "bonafide" else 0,
                    speaker=speaker,
                    name=f"{fname}.flac",
                )
            )
    utts = _apply_subset(utts, subset)
    utts = _subsample(utts, num_samples, sample_seed)
    return SpoofDataset(utts, audio, name="asvspoof2021")


def _glob_dataset(
    root_dir: str,
    pattern: str,
    name: str,
    num_samples: Optional[int],
    audio: AudioConfig,
) -> SpoofDataset:
    files = sorted(_glob.glob(os.path.join(root_dir, pattern), recursive=True))
    if num_samples is not None:
        files = files[: int(num_samples)]
    utts = [
        Utterance(path=f, label=1, speaker="unknown", name=os.path.basename(f))
        for f in files
    ]
    return SpoofDataset(utts, audio, name=name)


def parse_ravdess(
    root_dir: str, num_samples: Optional[int] = None, audio: AudioConfig = AudioConfig()
) -> SpoofDataset:
    """RAVDESS: all Actor_*/ wavs, constant bonafide label
    (reference: data_loader.py:218-240)."""
    return _glob_dataset(root_dir, "**/Actor_*/*.wav", "ravdess", num_samples, audio)


def parse_common_voice(
    root_dir: str, num_samples: Optional[int] = None, audio: AudioConfig = AudioConfig()
) -> SpoofDataset:
    """CommonVoice: all wavs under the root, constant bonafide label
    (reference: data_loader.py:242-264)."""
    return _glob_dataset(root_dir, "**/*.wav", "common_voice", num_samples, audio)

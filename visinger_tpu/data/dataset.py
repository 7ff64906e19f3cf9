"""Online dataset: binarized records -> static-shape padded batches.

Parity target: reference VISingerDataset + batch_by_size token bucketing
(tasks/dataset_utils.py:98-208, utils/commons/dataset_utils.py:69-150) with
the TPU-required change: batches are padded to a fixed set of (frame, token)
bucket edges so jit compiles a small number of programs instead of one per
ragged shape (SURVEY.md §7 "hard parts": dynamic shapes).

Each record (see binarizer.py) holds token sequences, mel2ph, f0, and the
raw waveform.  The linear spectrogram is NOT computed here — the train step
computes it on device (training/train_step.py).
"""

from __future__ import annotations

import bisect
from typing import Iterator, Sequence

import numpy as np

from visinger_tpu.data.record_store import RecordReader
from visinger_tpu.utils.audio.pitch import norm_interp_f0


def _bucket_edge(value: int, buckets: Sequence[int]) -> int:
    i = bisect.bisect_left(buckets, value)
    if i == len(buckets):
        raise ValueError(f"length {value} exceeds largest bucket {buckets[-1]}")
    return buckets[i]


def batch_by_size(lengths: np.ndarray, max_tokens: int, max_sentences: int,
                  indices: np.ndarray | None = None) -> list[np.ndarray]:
    """fairseq-style token bucketing (dataset_utils.py:69-116): size-sorted
    indices greedily grouped under a frames-per-batch and sentences-per-batch
    budget (budget counts the max length in the batch times batch size)."""
    if indices is None:
        indices = np.argsort(lengths, kind="mergesort")
    batches, cur, cur_max = [], [], 0
    for idx in indices:
        n = int(lengths[idx])
        new_max = max(cur_max, n)
        if cur and (len(cur) + 1 > max_sentences
                    or new_max * (len(cur) + 1) > max_tokens):
            batches.append(np.asarray(cur))
            cur, cur_max = [], 0
        cur.append(int(idx))
        cur_max = max(cur_max, n)
    if cur:
        batches.append(np.asarray(cur))
    return batches


class VISingerDataset:
    """Random-access view over a binarized split."""

    def __init__(self, cfg, prefix: str, data_dir: str | None = None,
                 cache_items: bool | None = None):
        self.cfg = cfg
        data_dir = data_dir or cfg.binary_data_dir
        self.reader = RecordReader(f"{data_dir}/{prefix}")
        self.lengths = np.load(f"{data_dir}/{prefix}_lengths.npy")
        self.hop_size = cfg.hop_size
        seg = cfg.segment_size
        max_frames = cfg.max_frames
        self.keep = np.where((self.lengths > seg) & (self.lengths <= max_frames))[0]
        # decoded-item RAM cache: CSD-scale data (~2 h of f16 wav) fits in
        # host memory and per-step decode otherwise dominates step time
        self._cache: dict[int, dict] | None = {} if (
            cache_items if cache_items is not None
            else bool(cfg.get("cache_dataset", True))) else None

    def __len__(self) -> int:
        return len(self.keep)

    def item_length(self, i: int) -> int:
        return int(self.lengths[self.keep[i]])

    def __getitem__(self, i: int) -> dict:
        if self._cache is not None and i in self._cache:
            return self._cache[i]
        item = self.reader[int(self.keep[i])]
        t = len(item["mel2ph"])
        f0, uv = norm_interp_f0(np.asarray(item["f0"][:t], np.float64))
        out = {
            "item_name": item.get("item_name", str(i)),
            "text_tokens": np.asarray(item["ph_token"], np.int32),
            "note_pitch": np.asarray(item["note_pitch"], np.int32),
            "note_dur": np.asarray(item["note_dur"], np.int32),
            "mel2ph": np.asarray(item["mel2ph"], np.int32),
            "f0": f0,
            "uv": uv,
            "wav": np.asarray(item["wav"], np.float32),
            "spk_id": int(item.get("spk_id", 0)),
        }
        if "spk_embed" in item:
            out["spk_embed"] = np.asarray(item["spk_embed"], np.float32)
        if self._cache is not None:
            self._cache[i] = out
        return out

    # ------------------------------------------------------------------
    def collate(self, items: list[dict], frame_buckets=None, token_buckets=None,
                n_real: int | None = None) -> dict:
        """``n_real``: number of real (non-duplicate-padding) items; rows at
        index >= n_real get item_weights 0 so losses ignore them."""
        cfg = self.cfg
        frame_buckets = frame_buckets or list(cfg.frame_buckets)
        token_buckets = token_buckets or list(cfg.token_buckets)
        b = len(items)
        n_real = b if n_real is None else n_real
        t = _bucket_edge(max(len(it["mel2ph"]) for it in items), frame_buckets)
        n = _bucket_edge(max(len(it["text_tokens"]) for it in items), token_buckets)
        hop = self.hop_size

        # optional int16 PCM shipping halves host->device bytes, but the
        # packed 16-bit layout propagates badly through XLA on TPU (measured
        # ~8x step slowdown) — default f32; enable only on starved links
        wav_i16 = bool(self.cfg.get("ship_wav_int16", False))
        batch = {
            "text_tokens": np.zeros((b, n), np.int32),
            "note_pitch": np.zeros((b, n), np.int32),
            "note_dur": np.zeros((b, n), np.int32),
            "text_lengths": np.zeros((b,), np.int32),
            "mel2ph": np.zeros((b, t), np.int32),
            "mel_lengths": np.zeros((b,), np.int32),
            "f0": np.zeros((b, t), np.float32),
            "uv": np.zeros((b, t), np.float32),
            "wavs": np.zeros((b, t * hop),
                             np.int16 if wav_i16 else np.float32),
            "spk_ids": np.zeros((b,), np.int32),
            "item_weights": (np.arange(b) < n_real).astype(np.float32),
        }
        if "spk_embed" in items[0]:
            batch["spk_embed"] = np.stack(
                [it["spk_embed"] for it in items]).astype(np.float32)
        for i, it in enumerate(items):
            nl, tl = len(it["text_tokens"]), len(it["mel2ph"])
            batch["text_tokens"][i, :nl] = it["text_tokens"]
            batch["note_pitch"][i, :nl] = it["note_pitch"][:nl]
            batch["note_dur"][i, :nl] = it["note_dur"][:nl]
            batch["text_lengths"][i] = nl
            batch["mel2ph"][i, :tl] = it["mel2ph"]
            batch["mel_lengths"][i] = tl
            batch["f0"][i, :tl] = it["f0"][:tl]
            batch["uv"][i, :tl] = it["uv"][:tl]
            wav = it["wav"][: tl * hop]
            if wav_i16:
                wav = np.clip(wav * 32767.0, -32768, 32767).astype(np.int16)
            batch["wavs"][i, : len(wav)] = wav
            batch["spk_ids"][i] = it["spk_id"]
        return batch

    def batches(self, max_tokens: int | None = None,
                max_sentences: int | None = None, shuffle: bool = True,
                seed: int = 0, pad_to_max_sentences: bool = True,
                ) -> Iterator[dict]:
        """One epoch of static-shape batches.

        Size-sorted token bucketing like the reference (sort_by_len), batch
        order shuffled per epoch.  With ``pad_to_max_sentences`` the batch
        axis is padded by repeating the last item so every program has the
        same leading dim; duplicates carry item_weights 0 so every loss
        reduction ignores them (matches the reference's ragged batches).
        """
        cfg = self.cfg
        max_tokens = max_tokens or cfg.max_tokens
        max_sentences = max_sentences or cfg.max_sentences
        lengths = np.asarray([self.item_length(i) for i in range(len(self))])
        order = np.argsort(lengths, kind="mergesort")
        batches = batch_by_size(lengths, max_tokens, max_sentences, order)
        rng = np.random.RandomState(seed)
        if shuffle:
            rng.shuffle(batches)
        for idx in batches:
            items = [self[int(i)] for i in idx]
            n_real = len(items)
            if pad_to_max_sentences:
                while len(items) < max_sentences:
                    items.append(items[-1])
            yield self.collate(items, n_real=n_real)


# ---------------------------------------------------------------------------
# Multi-dataset concat training (reference BaseConcatDataset + the token-map
# consistency check, tasks/base.py:44-53, utils/commons/dataset_utils.py:
# 205-219): several binarized corpora train as one dataset provided they
# share the exact token dictionaries.
# ---------------------------------------------------------------------------

_SHARED_DICTS = ("phone_set.json", "pitch_map.json", "dur_map.json",
                 "tempo_map.json", "spk_map.json")


def check_dict_consistency(data_dirs: Sequence[str]) -> None:
    """Every concatenated corpus must be binarized with identical token
    dictionaries — token ids are meaningless across mismatched maps."""
    import json
    import os

    ref_dir = data_dirs[0]
    for name in _SHARED_DICTS:
        ref_fn = os.path.join(ref_dir, name)
        if not os.path.exists(ref_fn):
            continue
        with open(ref_fn) as f:
            ref = json.load(f)
        for d in data_dirs[1:]:
            with open(os.path.join(d, name)) as f:
                other = json.load(f)
            if other != ref:
                raise ValueError(
                    f"concat datasets disagree on {name}: {d} vs {ref_dir} — "
                    "re-binarize every corpus with shared dictionaries")


class ConcatVISingerDataset(VISingerDataset):
    """Concatenation of several binarized corpora behind the VISingerDataset
    interface; collate/batches/token-bucketing are inherited unchanged."""

    def __init__(self, cfg, prefix: str, data_dirs: Sequence[str]):
        check_dict_consistency(list(data_dirs))
        self.cfg = cfg
        self.hop_size = cfg.hop_size
        self.parts = [VISingerDataset(cfg, prefix, data_dir=d)
                      for d in data_dirs]
        self._index = [(p, i) for p, part in enumerate(self.parts)
                       for i in range(len(part))]

    def __len__(self) -> int:
        return len(self._index)

    def item_length(self, i: int) -> int:
        p, j = self._index[i]
        return self.parts[p].item_length(j)

    def __getitem__(self, i: int) -> dict:
        p, j = self._index[i]
        return self.parts[p][j]


def build_dataset(cfg, prefix: str) -> VISingerDataset:
    """cfg.binary_data_dirs (list) -> concat training over every corpus;
    otherwise the single cfg.binary_data_dir."""
    dirs = cfg.get("binary_data_dirs")
    if dirs:
        return ConcatVISingerDataset(cfg, prefix, list(dirs))
    return VISingerDataset(cfg, prefix)

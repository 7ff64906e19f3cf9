"""Device-resident dataset store.

The reference streams every batch host->device (move_to_cuda per step,
trainer.py:325).  On a tunneled/remote TPU that transfer is the training
bottleneck (~0.5 s per 2 MB batch, unoverlappable).  CSD-scale data is tiny
by HBM standards (~400 MB as int16 wav), so the TPU-native design uploads
the ENTIRE binarized split to device memory once; each step then ships only
a [B] index vector, and batch assembly (gather + static bucket slice +
dequantize) happens inside the compiled step.

Layout: items padded to the largest bucket; per-bucket programs slice the
leading T_bucket frames statically (rows are sorted into buckets by length,
so the tail is padding).
"""

from __future__ import annotations

import bisect

import jax
import jax.numpy as jnp
import numpy as np

from visinger_tpu.data.dataset import VISingerDataset, batch_by_size


class DeviceStore:
    """Padded on-device tensors for one split + host-side batch plans."""

    def __init__(self, ds: VISingerDataset, sharding=None):
        cfg = ds.cfg
        self.cfg = cfg
        self.hop = cfg.hop_size
        n = len(ds)
        t_max = max(cfg.frame_buckets)
        n_max = max(cfg.token_buckets)
        # wavs stored f32: int16 HBM storage halves memory but its packed
        # 16-bit tiling propagates through XLA layout assignment into the
        # whole waveform pipeline — measured ~8x slower train step.
        wav_dtype = np.float32 if bool(cfg.get("store_wav_f32", True)) \
            else np.int16
        wavs = np.zeros((n, t_max * self.hop), wav_dtype)
        f0 = np.zeros((n, t_max), np.float32)
        uv = np.zeros((n, t_max), np.int8)
        mel2ph = np.zeros((n, t_max), np.int32)
        tokens = np.zeros((n, 3, n_max), np.int32)  # ph / pitch / dur
        lengths = np.zeros((n,), np.int32)
        tok_lengths = np.zeros((n,), np.int32)
        spk = np.zeros((n,), np.int32)
        spk_embed = None
        for i in range(n):
            it = ds[i]
            if "spk_embed" in it:
                if spk_embed is None:
                    spk_embed = np.zeros((n, len(it["spk_embed"])), np.float32)
                spk_embed[i] = it["spk_embed"]
            t = min(len(it["mel2ph"]), t_max)
            nl = min(len(it["text_tokens"]), n_max)
            if wav_dtype == np.int16:
                w = np.clip(it["wav"][: t * self.hop] * 32767.0,
                            -32768, 32767).astype(np.int16)
            else:
                w = it["wav"][: t * self.hop].astype(np.float32)
            wavs[i, : len(w)] = w
            f0[i, :t] = it["f0"][:t]
            uv[i, :t] = it["uv"][:t]
            mel2ph[i, :t] = it["mel2ph"][:t]
            tokens[i, 0, :nl] = it["text_tokens"][:nl]
            tokens[i, 1, :nl] = it["note_pitch"][:nl]
            tokens[i, 2, :nl] = it["note_dur"][:nl]
            lengths[i] = t
            tok_lengths[i] = nl
            spk[i] = it["spk_id"]
        put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
            else jax.device_put
        self.arrays = {
            "wavs": put(wavs), "f0": put(f0), "uv": put(uv),
            "mel2ph": put(mel2ph), "tokens": put(tokens),
            "mel_lengths": put(lengths), "text_lengths": put(tok_lengths),
            "spk_ids": put(spk),
        }
        if spk_embed is not None:
            self.arrays["spk_embed"] = put(spk_embed)
        self.item_lengths = lengths
        self.item_tok_lengths = tok_lengths
        self.frame_buckets = list(cfg.frame_buckets)
        self.token_buckets = list(cfg.token_buckets)

    # ------------------------------------------------------------------
    def plan_batches(self, max_tokens=None, max_sentences=None, shuffle=True,
                     seed=0):
        """Host-side epoch plan: list of (idx array [B], t_bucket, n_bucket).

        Same token-budget bucketing as the host dataset; batch padded to
        max_sentences by repeating the last index."""
        cfg = self.cfg
        max_tokens = max_tokens or cfg.max_tokens
        max_sentences = max_sentences or cfg.max_sentences
        order = np.argsort(self.item_lengths, kind="mergesort")
        batches = batch_by_size(self.item_lengths, max_tokens, max_sentences,
                                order)
        rng = np.random.RandomState(seed)
        if shuffle:
            rng.shuffle(batches)
        plans = []
        for idx in batches:
            idx = list(idx) + [idx[-1]] * (max_sentences - len(idx))
            t_need = int(max(self.item_lengths[i] for i in idx))
            n_need = int(max(self.item_tok_lengths[i] for i in idx))
            t_b = self.frame_buckets[bisect.bisect_left(self.frame_buckets, t_need)]
            n_b = self.token_buckets[bisect.bisect_left(self.token_buckets, n_need)]
            plans.append((np.asarray(idx, np.int32), t_b, n_b))
        return plans


def gather_batch(store_arrays: dict, idxs: jax.Array, t_bucket: int,
                 n_bucket: int, hop: int) -> dict:
    """Jit-side batch assembly: gather rows, slice to the (static) bucket.

    Returns the same batch dict contract as the host collate
    (wavs stay int16; the train step dequantizes)."""
    g = lambda a: jnp.take(a, idxs, axis=0)  # noqa: E731
    tokens = g(store_arrays["tokens"])[:, :, :n_bucket]
    mel2ph = g(store_arrays["mel2ph"])[:, :t_bucket]
    # clamp lengths into the bucket (defensive; plans guarantee fit)
    mel_lengths = jnp.minimum(g(store_arrays["mel_lengths"]), t_bucket)
    # item validity: plans pad the batch by repeating the LAST index, and
    # real indices within a batch are unique — so a repeat of its left
    # neighbor marks a padding duplicate (weight 0 in every loss).
    item_weights = jnp.concatenate(
        [jnp.ones((1,), jnp.float32),
         (idxs[1:] != idxs[:-1]).astype(jnp.float32)])
    out = {
        "item_weights": item_weights,
        "wavs": g(store_arrays["wavs"])[:, : t_bucket * hop],
        "f0": g(store_arrays["f0"])[:, :t_bucket],
        "uv": g(store_arrays["uv"])[:, :t_bucket].astype(jnp.float32),
        "mel2ph": mel2ph,
        "text_tokens": tokens[:, 0],
        "note_pitch": tokens[:, 1],
        "note_dur": tokens[:, 2],
        "mel_lengths": mel_lengths,
        "text_lengths": jnp.minimum(g(store_arrays["text_lengths"]), n_bucket),
        "spk_ids": g(store_arrays["spk_ids"]),
    }
    if "spk_embed" in store_arrays:
        out["spk_embed"] = g(store_arrays["spk_embed"])
    return out

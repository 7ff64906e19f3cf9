"""AOT serving export: serialize the compiled synthesis program.

No reference equivalent — the reference (inference/visinger.py:20-38)
rebuilds the torch model from source at load time.  This is the TPU-native
deployment path: the full synthesis function (score tokens -> prior sample
-> flow reverse -> HiFi-GAN decode -> waveform) is lowered once to
StableHLO with ``jax.export`` and written as a versioned artifact that a
serving process can load and execute WITHOUT the model source code, flax,
or the config system — only jax and the weight file.

Artifact layout (a directory):
  synthesis.jaxexport   serialized StableHLO program (jax.export bytes)
  params.msgpack        generator weights (flax msgpack, template-free)
  meta.json             input shapes, platforms, audio params, jax version

The program is exported at ONE static (batch, token, frame) bucket shape —
the same static-shape discipline the live path uses (infer/infer.py
_pad_to_bucket) — so the serving process pads exactly like the CLI does.
Multi-platform lowering (cpu+tpu) means one artifact serves both a CPU
smoke-test host and the TPU fleet.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

ARTIFACT_VERSION = 1


def _synthesis_fn(model):
    """Flat-positional synthesis function (closure over module config only;
    all state arrives via ``params``)."""

    def fn(params, text_tokens, note_pitch, note_dur, mel2ph, spk_ids, seed):
        rng = jax.random.PRNGKey(seed)
        out = model.apply(
            {"params": params},
            text_tokens=text_tokens, pitch_tokens=note_pitch,
            dur_tokens=note_dur, mel2ph=mel2ph, spk_id=spk_ids,
            infer=True, deterministic=True, rngs={"sample": rng})
        return out["wav_out"]

    return fn


def export_synthesis(cfg, model, params_g, out_dir: str,
                     batch_size: int = 1, n_tokens: int | None = None,
                     n_frames: int | None = None,
                     platforms: tuple[str, ...] | None = None) -> dict:
    """Lower + serialize the synthesis program; write the artifact dir.

    Defaults to the largest configured token/frame buckets (the shapes the
    live CLI pads to).  Returns the meta dict.
    """
    from flax import serialization

    n_tokens = int(n_tokens or max(cfg.token_buckets))
    n_frames = int(n_frames or max(cfg.frame_buckets))
    i32 = jnp.int32
    specs = (
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                     params_g),
        jax.ShapeDtypeStruct((batch_size, n_tokens), i32),   # text_tokens
        jax.ShapeDtypeStruct((batch_size, n_tokens), i32),   # note_pitch
        jax.ShapeDtypeStruct((batch_size, n_tokens), i32),   # note_dur
        jax.ShapeDtypeStruct((batch_size, n_frames), i32),   # mel2ph
        jax.ShapeDtypeStruct((batch_size,), i32),            # spk_ids
        jax.ShapeDtypeStruct((), i32),                       # seed
    )
    kw = {}
    if platforms:
        kw["platforms"] = list(platforms)
    exported = jax.export.export(jax.jit(_synthesis_fn(model)), **kw)(*specs)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "synthesis.jaxexport"), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree.map(np.asarray, params_g)))
    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "batch_size": batch_size,
        "n_tokens": n_tokens,
        "n_frames": n_frames,
        "sample_rate": int(cfg.sample_rate),
        "hop_size": int(cfg.hop_size),
        "out_wav_norm": bool(cfg.get("out_wav_norm", True)),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedSynthesizer:
    """Load + run a serialized synthesis artifact (no model source needed).

    ``__call__`` takes unpadded int32 1-D score arrays (one score), pads to
    the exported bucket shape, and returns the valid waveform samples.
    """

    def __init__(self, art_dir: str):
        from flax import serialization

        with open(os.path.join(art_dir, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta["artifact_version"] > ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {self.meta['artifact_version']} is newer "
                f"than this loader ({ARTIFACT_VERSION})")
        with open(os.path.join(art_dir, "synthesis.jaxexport"), "rb") as f:
            self.exported = jax.export.deserialize(bytearray(f.read()))
        with open(os.path.join(art_dir, "params.msgpack"), "rb") as f:
            self.params = serialization.msgpack_restore(f.read())
        self._call = jax.jit(self.exported.call)

    def __call__(self, text_tokens, note_pitch, note_dur, mel2ph,
                 spk_id: int = 0, seed: int = 0) -> np.ndarray:
        m = self.meta
        n, t = len(text_tokens), len(mel2ph)
        if n > m["n_tokens"] or t > m["n_frames"]:
            raise ValueError(
                f"score ({n} tokens, {t} frames) exceeds the exported bucket "
                f"({m['n_tokens']}, {m['n_frames']}) — split into phrases or "
                "re-export with larger buckets")
        b = m["batch_size"]

        def pad(x, width):
            out = np.zeros((b, width), np.int32)
            out[0, :len(x)] = np.asarray(x, np.int32)
            return out

        wav = self._call(
            self.params, pad(text_tokens, m["n_tokens"]),
            pad(note_pitch, m["n_tokens"]), pad(note_dur, m["n_tokens"]),
            pad(mel2ph, m["n_frames"]),
            np.full((b,), spk_id, np.int32), np.int32(seed))
        return np.asarray(wav)[0, : t * m["hop_size"]]

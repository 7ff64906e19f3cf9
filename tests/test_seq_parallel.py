"""Sequence-parallel synthesis: time-sharded infer over an 8-device CPU mesh
must match single-device output (parallel/sp.py).  The reference has no
multi-device inference; this is the TPU-native long-score serving path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visinger_tpu.models.factory import build_models, init_params, tiny_config
from visinger_tpu.data.synthetic import synthetic_batch
from visinger_tpu.parallel.sp import (
    jit_sp_infer,
    make_sp_mesh,
    pad_frames_for_mesh,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sp_infer_matches_single_device():
    cfg = tiny_config()
    raw = synthetic_batch(2, 12, 64, num_linear_bins=cfg.num_linear_bins,
                          hop_size=cfg.hop_size)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    model, disc = build_models(cfg, ph_vocab=40, pitch_vocab=96, dur_vocab=64)
    pg, _ = init_params(cfg, model, disc, batch)

    mesh = make_sp_mesh(jax.devices()[:8])
    t = int(batch["mel2ph"].shape[1])
    assert pad_frames_for_mesh(t, mesh) == t  # 64 divides 8
    assert pad_frames_for_mesh(t + 1, mesh) == t + 8

    rng = jax.random.PRNGKey(7)
    args = (pg, batch["text_tokens"], batch["note_pitch"], batch["note_dur"],
            batch["mel2ph"], batch["spk_ids"], rng)

    def single(params, tt, pt, dt, m2p, spk, key):
        out = model.apply({"params": params}, text_tokens=tt,
                          pitch_tokens=pt, dur_tokens=dt, mel2ph=m2p,
                          spk_id=spk, infer=True, deterministic=True,
                          rngs={"sample": key})
        return out["wav_out"]

    ref = np.asarray(jax.jit(single)(*args))

    sp_fn = jit_sp_infer(model, mesh)
    wav = sp_fn(*args)
    # the output really is sharded over the mesh's time axis
    assert len(wav.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(wav), ref, atol=2e-4)

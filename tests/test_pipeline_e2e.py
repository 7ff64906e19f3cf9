"""End-to-end data pipeline: synthetic corpus -> binarize -> dataset ->
one fused train step.  The e2e slice of SURVEY.md §7 step 7."""

import json

import jax
import numpy as np
import pytest

from visinger_tpu.data.binarizer import Binarizer
from visinger_tpu.data.dataset import VISingerDataset, batch_by_size
from visinger_tpu.data.synthetic_corpus import generate_corpus
from visinger_tpu.models.factory import build_models, init_state, tiny_config
from visinger_tpu.training.train_step import make_train_step


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    processed = str(root / "processed")
    binary = str(root / "binary")
    generate_corpus(processed, n_items=6, seed=0)
    cfg = tiny_config().replace(
        processed_data_dir=processed,
        binary_data_dir=binary,
        frame_buckets=[64, 128, 192, 256, 320, 384, 448, 512],
        token_buckets=[16, 32, 48, 64],
        max_frames=512,
    )
    cfg = cfg.replace(binarization_args=cfg.binarization_args.to_dict() | {
        "train_range": [2, -1], "valid_range": [1, 2], "test_range": [0, 1],
        "min_text": 2,
    })
    Binarizer(cfg).process()
    return cfg, binary


def test_binarizer_outputs(corpus):
    cfg, binary = corpus
    lengths = np.load(f"{binary}/train_lengths.npy")
    assert len(lengths) >= 3
    with open(f"{binary}/pitch_map.json") as f:
        pitch_map = json.load(f)
    assert pitch_map["0"] == 0 and pitch_map["12"] == 1


def test_dataset_batches_static_shapes(corpus):
    cfg, _ = corpus
    ds = VISingerDataset(cfg, "train")
    assert len(ds) >= 1
    item = ds[0]
    t = len(item["mel2ph"])
    assert len(item["f0"]) == t and len(item["uv"]) == t
    assert len(item["wav"]) >= t * cfg.hop_size
    assert (item["mel2ph"] > 0).all()
    # tokens: ph/pitch/dur counts must match (the concat-embedding contract)
    assert len(item["text_tokens"]) == len(item["note_pitch"]) == len(item["note_dur"])
    batches = list(ds.batches(shuffle=False))
    for b in batches:
        assert b["mel2ph"].shape[1] in cfg.frame_buckets
        assert b["text_tokens"].shape[1] in cfg.token_buckets
        assert b["wavs"].shape[1] == b["mel2ph"].shape[1] * cfg.hop_size
        assert b["wavs"].shape[0] == cfg.max_sentences


def test_batch_by_size_budgets():
    lengths = np.asarray([10, 20, 30, 40, 50, 60])
    batches = batch_by_size(lengths, max_tokens=100, max_sentences=3)
    seen = sorted(int(i) for b in batches for i in b)
    assert seen == list(range(6))
    for b in batches:
        mx = max(lengths[i] for i in b)
        assert mx * len(b) <= 100 and len(b) <= 3


def test_train_step_on_real_pipeline_batch(corpus):
    cfg, _ = corpus
    ds = VISingerDataset(cfg, "train")
    batch = next(ds.batches(shuffle=False))
    import jax.numpy as jnp

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    with open(f"{cfg.binary_data_dir}/pitch_map.json") as f:
        pv = len(json.load(f))
    with open(f"{cfg.binary_data_dir}/dur_map.json") as f:
        dv = len(json.load(f))
    from visinger_tpu.utils.text.token_encoder import build_token_encoder

    enc = build_token_encoder(f"{cfg.binary_data_dir}/phone_set.json")
    model, disc = build_models(cfg, ph_vocab=len(enc), pitch_vocab=pv, dur_vocab=dv)
    state = init_state(cfg, model, disc, jb)
    step_fn = jax.jit(make_train_step(cfg, model, disc))
    state, metrics = step_fn(state, jb)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_trainer_test_loop_quality_metrics(corpus, tmp_path):
    """Trainer.test: synthesizes the test split, writes results.json with
    RTF + MCD + mel-L1 vs ground truth (BASELINE.md quality bar)."""
    import json as _json
    import os

    from visinger_tpu.training.trainer import Trainer

    cfg, binary = corpus
    cfg = cfg.replace(work_dir=str(tmp_path / "exp"), max_sentences=2,
                      tb_log_interval=1, val_check_interval=100,
                      num_sanity_val_steps=0, save_codes=False)
    tr = Trainer(cfg)
    state = tr.fit(max_updates=2)
    results = tr.test(state, out_dir=str(tmp_path / "gen"))
    assert len(results) >= 1
    for r in results:
        assert os.path.exists(str(tmp_path / "gen" / "wavs" / r["wav_fn_pred"]))
        assert r["rtf"] > 0
        assert np.isfinite(r["mcd"]) and r["mcd"] > 0  # untrained: nonzero
        assert np.isfinite(r["mel_l1"]) and r["mel_l1"] > 0
    with open(tmp_path / "gen" / "results.json") as f:
        assert len(_json.load(f)) == len(results)


def test_trainer_loop_counts_optimizer_steps_under_accum(corpus, tmp_path):
    """Trainer.fit(max_updates=N) with accumulate_grad_batches=k performs
    N OPTIMIZER steps = N*k micro-batches (the reference's global_step
    advances per optimizer step, trainer.py:339,368) — not N micro-batches."""
    from visinger_tpu.training.trainer import Trainer

    cfg, binary = corpus
    cfg = cfg.replace(work_dir=str(tmp_path / "exp"), max_sentences=2,
                      accumulate_grad_batches=2, tb_log_interval=1,
                      val_check_interval=100, num_sanity_val_steps=0,
                      save_codes=False)
    tr = Trainer(cfg)
    state = tr.fit(max_updates=2)
    assert int(state.step) == 4  # 2 optimizer steps x accum 2 micro-batches


def test_trainer_async_checkpointing(corpus, tmp_path):
    """With async_checkpoint: true the fit loop writes checkpoints from the
    background thread (donation-safe device-side snapshot); the files are
    restorable and the final save is durable before fit() returns."""
    from visinger_tpu.training.checkpoint import latest_checkpoint, restore_latest
    from visinger_tpu.training.trainer import Trainer

    cfg, binary = corpus
    cfg = cfg.replace(work_dir=str(tmp_path / "exp"), max_sentences=2,
                      async_checkpoint=True, tb_log_interval=1,
                      val_check_interval=1, num_sanity_val_steps=0,
                      save_codes=False)
    tr = Trainer(cfg)
    state = tr.fit(max_updates=2)
    path = latest_checkpoint(str(tmp_path / "exp"))
    assert path is not None and path.endswith("steps_2.msgpack")
    restored, step = restore_latest(str(tmp_path / "exp"), state)
    assert step == 2
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params_g)[0]),
        np.asarray(jax.tree.leaves(state.params_g)[0]))


def test_tb_media_logged_at_render(corpus, tmp_path):
    """render_valid pushes audio (pred + GT-once) and the pred|GT mel figure
    into TensorBoard (reference save_valid_result/plot_mel,
    tasks/visinger.py:175-185, tasks/base.py:249-271) — VERDICT r2 #4."""
    import os

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    from visinger_tpu.training.trainer import Trainer

    cfg, binary = corpus
    cfg = cfg.replace(work_dir=str(tmp_path / "exp_tb"), max_sentences=2,
                      num_valid_plots=1, save_codes=False)
    tr = Trainer(cfg)
    assert tr.logger is not None and tr.logger._tb is not None
    ds = VISingerDataset(cfg, cfg.valid_set_name)
    batch = next(ds.batches(shuffle=False))
    state = tr._init_state(batch)
    tr.render_valid(state, ds, step=1, n_items=1)
    tr.logger._tb.flush()
    ea = EventAccumulator(os.path.join(cfg.work_dir, "tb"),
                          size_guidance={"audio": 0, "images": 0})
    ea.Reload()
    tags = ea.Tags()
    assert "wav_val_0" in tags["audio"], tags
    assert "wav_gt_0" in tags["audio"], tags  # GT once, first render window
    assert any("mel_val_0" in t for t in tags["images"]), tags


def test_concat_dataset_and_dict_consistency(corpus, tmp_path):
    """Multi-corpus concat training (reference BaseConcatDataset +
    dict-consistency check, tasks/base.py:44-53) — VERDICT r2 missing #6."""
    from visinger_tpu.data.dataset import (
        ConcatVISingerDataset,
        build_dataset,
        check_dict_consistency,
    )

    cfg, binary = corpus
    # a second corpus binarized with IDENTICAL dictionaries: same processed
    # data, second binary dir
    binary2 = str(tmp_path / "binary2")
    Binarizer(cfg.replace(binary_data_dir=binary2)).process()

    single = VISingerDataset(cfg, "train")
    ds = build_dataset(cfg.replace(binary_data_dirs=[binary, binary2]),
                       "train")
    assert isinstance(ds, ConcatVISingerDataset)
    assert len(ds) == 2 * len(single)
    assert ds.item_length(len(single)) == ds.item_length(0)
    batch = next(ds.batches(shuffle=False))
    assert batch["mel2ph"].shape[1] in cfg.frame_buckets

    # inconsistent dictionaries must be rejected
    import shutil

    binary3 = str(tmp_path / "binary3")
    shutil.copytree(binary, binary3)
    with open(f"{binary3}/pitch_map.json") as f:
        pm = json.load(f)
    pm["999"] = len(pm)  # a corpus binarized with a different note map
    with open(f"{binary3}/pitch_map.json", "w") as f:
        json.dump(pm, f)
    with pytest.raises(ValueError, match="disagree"):
        check_dict_consistency([binary, binary3])


def test_cli_train_with_test_after_train(corpus, tmp_path):
    """`run train` with test_after_train: true scores the test split in the
    SAME process after fit() (run.py cmd_train) — on remote-compile backends
    a separate `run test` process would pay every program compile again."""
    import os

    import yaml

    from visinger_tpu.run import main

    cfg, binary = corpus
    cfg = cfg.replace(work_dir=str(tmp_path / "exp_cli"), max_sentences=2,
                      max_updates=2, tb_log_interval=1,
                      val_check_interval=100, num_sanity_val_steps=0,
                      save_codes=False, test_after_train=True)
    cfg_fn = tmp_path / "cfg.yaml"
    cfg_fn.write_text(yaml.safe_dump(cfg.to_dict()))
    main(["train", "--config", str(cfg_fn)])
    out = tmp_path / "exp_cli" / "test_after_train"
    assert os.path.exists(str(out / "results.json"))

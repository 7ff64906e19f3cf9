"""Unified CLI — train / preprocess / binarize / infer / bench.

Parity target: the reference's entry points (tasks/runs/run.py,
preprocessor/runs/{base_preprocess,base_binarize}.py, inference/visinger.py)
collapsed into one argparse CLI:

  python -m visinger_tpu.run train      --config cfg.yaml --exp_name x
  python -m visinger_tpu.run preprocess --config cfg.yaml
  python -m visinger_tpu.run binarize   --config cfg.yaml
  python -m visinger_tpu.run infer      --config cfg.yaml --exp_name x \
                                        --midi song.mid --out out.wav
  python -m visinger_tpu.run infer      ... --midi_dir songs/ --out_dir gen/
                                        (batched serving: bucket-grouped,
                                        max_sentences scores per program)
  python -m visinger_tpu.run test       --config cfg.yaml   (synthesize test split + RTF)
  python -m visinger_tpu.run validate   --config cfg.yaml   (val losses from latest ckpt)
  python -m visinger_tpu.run synth-data --config cfg.yaml   (synthetic corpus)
  python -m visinger_tpu.run export     --exp_name x --out_dir art/
                                        (AOT serving artifact: StableHLO
                                        program + weights, infer/export.py)

--hparams "a=1,b.c=2" overrides dotted config keys (hparams.py:96-109 UX).
The work dir is checkpoints/<exp_name>; the merged config is persisted there
and re-merged on resume (hparams.py:79-90 semantics).
"""

from __future__ import annotations

import argparse
import json
import os

import yaml

from visinger_tpu.config import Config, load_config, parse_overrides


def _resolve_config(args, persist: bool = True) -> Config:
    overrides = parse_overrides(args.hparams or "")
    if getattr(args, "debug", False):
        # reference --debug (hparams.py:39,120): carried in the config; its
        # only runtime effect there is unmuting non-rank-0 stdout
        # (trainer.py:130) — this framework never mutes processes, so the
        # flag is informational + available to configs/tools.
        overrides["debug"] = True
    work_dir = None
    if args.exp_name:
        work_dir = os.path.join("checkpoints", args.exp_name)
        if getattr(args, "remove", False) and os.path.exists(work_dir):
            # reference --remove (hparams.py:110-113): interactive confirm,
            # then delete the experiment's work dir.  Non-interactive runs
            # (EOF on stdin) take the advertised N default instead of
            # crashing.
            try:
                answer = input("REMOVE old checkpoint? Y/N [Default: N]: ")
            except EOFError:
                answer = "n"
            if answer.strip().lower() == "y":
                import shutil

                shutil.rmtree(work_dir)
                print(f"| removed {work_dir}")
        saved = os.path.join(work_dir, "config.yaml")
        if os.path.exists(saved) and not args.reset:
            cfg = load_config(saved, overrides=overrides)
            return cfg.replace(work_dir=work_dir, exp_name=args.exp_name)
    cfg = load_config(args.config or None, overrides=overrides,
                      name=None if args.config else "visinger_csd")
    if work_dir:
        cfg = cfg.replace(work_dir=work_dir, exp_name=args.exp_name)
    # Persist the merged config into the work dir (reference hparams.py:79-90
    # re-merges checkpoints/<exp>/config.yaml on the next launch) — also for
    # --config runs, so a work dir is always self-describing/resumable.
    # Read-only commands (infer/test/validate) pass persist=False: their
    # one-off --hparams overrides must NOT rewrite the experiment's saved
    # config and silently change future training/resume behavior (the
    # reference likewise skips persistence under --infer, hparams.py:84).
    if persist and cfg.get("work_dir"):
        os.makedirs(cfg.work_dir, exist_ok=True)
        with open(os.path.join(cfg.work_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(cfg.to_dict(), f, allow_unicode=True)
    return cfg


class _Tee:
    """Duplicate stream writes into a log file (reference Tee,
    utils/commons/trainer.py:28-43 -> work_dir/terminal_logs/)."""

    def __init__(self, stream, fn):
        self._stream, self._f = stream, open(fn, "a", buffering=1)

    def write(self, data):
        self._stream.write(data)
        self._f.write(data)

    def flush(self):
        self._stream.flush()
        self._f.flush()

    def __getattr__(self, name):
        return getattr(self._stream, name)


def _tee_terminal(work_dir: str) -> None:
    import sys
    import time as _time

    log_dir = os.path.join(work_dir, "terminal_logs")
    os.makedirs(log_dir, exist_ok=True)
    fn = os.path.join(log_dir, f"log_{int(_time.time())}.txt")
    sys.stdout = _Tee(sys.stdout, fn)
    sys.stderr = _Tee(sys.stderr, fn)


def cmd_train(args):
    cfg = _resolve_config(args)
    if cfg.get("work_dir"):
        _tee_terminal(cfg.work_dir)
    # Multi-host bootstrap (replaces the reference's single-node NCCL setup,
    # utils/commons/trainer.py:497-507): explicit coordinator via config/env,
    # or jax.distributed auto-detection on TPU pods.  Must run before any
    # backend-initializing import.
    coord = cfg.get("coordinator_address", "") or os.environ.get(
        "VISINGER_COORDINATOR", "")
    n_proc = int(cfg.get("num_processes", 0) or os.environ.get(
        "VISINGER_NUM_PROCESSES", 0) or 0)
    proc_id = os.environ.get("VISINGER_PROCESS_ID", cfg.get("process_id"))
    if coord or cfg.get("distributed", False):
        from visinger_tpu.parallel.multihost import initialize_distributed

        initialize_distributed(coord or None, n_proc or None,
                               None if proc_id is None else int(proc_id))
    from visinger_tpu.training.trainer import Trainer

    trainer = Trainer(cfg)
    state = trainer.fit()
    # test_after_train: score the test split in the SAME process so the
    # render/test programs compiled during training are reused — on remote-
    # compile backends a separate `run test` process pays the full program
    # compile again (minutes per program; CLAUDE.md).  Mirrors the
    # reference's train->test flow without a new process.
    if cfg.get("test_after_train", False):
        import jax

        if jax.process_index() == 0:
            out_dir = os.path.join(cfg.work_dir, "test_after_train")
            trainer.test(state, out_dir=out_dir)


def cmd_preprocess(args):
    from visinger_tpu.data.preprocess import Preprocessor

    Preprocessor(_resolve_config(args)).process()


def cmd_binarize(args):
    from visinger_tpu.data.binarizer import Binarizer

    Binarizer(_resolve_config(args)).process()


def cmd_infer(args):
    from visinger_tpu.data.dataset import build_dataset  # noqa: F401
    from visinger_tpu.infer.infer import VISingerInfer
    from visinger_tpu.models.factory import build_models
    from visinger_tpu.training.checkpoint import latest_checkpoint, restore_checkpoint
    from visinger_tpu.utils.text.token_encoder import build_token_encoder

    if not args.midi and not args.midi_dir:
        raise SystemExit("infer requires --midi <file> or --midi_dir <dir>")
    cfg = _resolve_config(args, persist=False)
    if getattr(args, "stream", False):
        cfg = cfg.replace(stream_infer=True)
    data_dir = cfg.binary_data_dir
    enc = build_token_encoder(f"{data_dir}/phone_set.json")
    with open(f"{data_dir}/pitch_map.json") as f:
        pv = len(json.load(f))
    with open(f"{data_dir}/dur_map.json") as f:
        dv = len(json.load(f))
    from visinger_tpu.data.synthetic import synthetic_batch
    import jax.numpy as jnp

    model, disc = build_models(cfg, len(enc), pv, dv)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        1, 16, 64, vocab=len(enc), pitch_vocab=pv, dur_vocab=dv,
        num_linear_bins=cfg.num_linear_bins, hop_size=cfg.hop_size).items()}
    from visinger_tpu.models.factory import init_state

    template = init_state(cfg, model, disc, batch)
    ckpt = latest_checkpoint(cfg.work_dir)
    if ckpt is None:
        raise SystemExit(f"no checkpoint in {cfg.work_dir}")
    state = restore_checkpoint(ckpt, template)
    print(f"| loaded {ckpt} (step {int(state.step)})")
    infer = VISingerInfer(cfg, state.params_g)
    if args.midi_dir:
        import glob

        from visinger_tpu.utils.audio.io import save_wav

        fns = sorted(glob.glob(os.path.join(args.midi_dir, "*.mid")) +
                     glob.glob(os.path.join(args.midi_dir, "*.midi")))
        if not fns:
            raise SystemExit(f"no .mid files in {args.midi_dir}")
        out_dir = args.out_dir or "generated"
        os.makedirs(out_dir, exist_ok=True)
        results = infer.synthesize_batch(fns,
                                         pitch_control=args.pitch_control)
        summary = []
        for r in results:
            out_fn = os.path.join(
                out_dir,
                os.path.splitext(os.path.basename(r["fn"]))[0] + ".wav")
            save_wav(r.pop("wav"), out_fn, cfg.sample_rate,
                     norm=cfg.get("out_wav_norm", True))
            summary.append({**r, "out": out_fn})
        with open(os.path.join(out_dir, "results.json"), "w") as f:
            json.dump(summary, f, indent=1)
        mean_rtf = sum(r["rtf"] for r in summary) / len(summary)
        print(f"| wrote {len(summary)} wavs to {out_dir} "
              f"(mean RTF {mean_rtf:.3f})")
        return
    rtf = infer.to_file(args.midi, args.out,
                        pitch_control=args.pitch_control)
    print(f"| wrote {args.out} (RTF {rtf:.3f})")


def cmd_export(args):
    """Serialize the synthesis program to a deployable artifact
    (StableHLO via jax.export + weights + meta) — see infer/export.py."""
    from visinger_tpu.data.synthetic import synthetic_batch
    from visinger_tpu.infer.export import export_synthesis
    from visinger_tpu.models.factory import build_models, init_state
    from visinger_tpu.training.checkpoint import latest_checkpoint, restore_checkpoint
    from visinger_tpu.utils.text.token_encoder import build_token_encoder
    import jax.numpy as jnp

    cfg = _resolve_config(args, persist=False)
    data_dir = cfg.binary_data_dir
    enc = build_token_encoder(f"{data_dir}/phone_set.json")
    with open(f"{data_dir}/pitch_map.json") as f:
        pv = len(json.load(f))
    with open(f"{data_dir}/dur_map.json") as f:
        dv = len(json.load(f))
    model, disc = build_models(cfg, len(enc), pv, dv)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        1, 16, 64, vocab=len(enc), pitch_vocab=pv, dur_vocab=dv,
        num_linear_bins=cfg.num_linear_bins, hop_size=cfg.hop_size).items()}
    template = init_state(cfg, model, disc, batch)
    ckpt = latest_checkpoint(cfg.work_dir)
    if ckpt is None:
        raise SystemExit(f"no checkpoint in {cfg.work_dir}")
    state = restore_checkpoint(ckpt, template)
    print(f"| exporting {ckpt} (step {int(state.step)})")
    platforms = tuple(p for p in args.platforms.split(",") if p) or None
    buckets = None
    if args.buckets:  # "96x800,48x320" -> [(96, 800), (48, 320)]
        buckets = [tuple(int(v) for v in part.split("x"))
                   for part in args.buckets.split(",") if part]
    meta = export_synthesis(
        cfg, model, state.params_g, args.out_dir,
        batch_size=args.batch_size, buckets=buckets, platforms=platforms)
    print(f"| wrote artifact to {args.out_dir}: {json.dumps(meta)}")


def cmd_test(args):
    """Synthesize the test split from the latest checkpoint + report RTF."""
    from visinger_tpu.models.factory import init_state
    from visinger_tpu.training.checkpoint import restore_latest
    from visinger_tpu.training.trainer import Trainer

    cfg = _resolve_config(args, persist=False)
    tr = Trainer(cfg)
    from visinger_tpu.data.dataset import build_dataset

    ds = build_dataset(cfg, cfg.train_set_name)
    first = next(ds.batches(shuffle=False))
    state = tr._init_state(first)
    state, step = restore_latest(cfg.work_dir, state)
    if step == 0:
        raise SystemExit(f"no checkpoint in {cfg.work_dir}")
    print(f"| testing from step {step}")
    tr.test(state)


def cmd_validate(args):
    """Run validation only from the latest checkpoint (reference
    --validate)."""
    from visinger_tpu.training.checkpoint import restore_latest
    from visinger_tpu.training.trainer import Trainer
    from visinger_tpu.data.dataset import build_dataset

    cfg = _resolve_config(args, persist=False)
    tr = Trainer(cfg)
    ds = build_dataset(cfg, cfg.train_set_name)
    first = next(ds.batches(shuffle=False))
    state = tr._init_state(first)
    state, step = restore_latest(cfg.work_dir, state)
    if step == 0:
        raise SystemExit(f"no checkpoint in {cfg.work_dir}")
    print(f"| validating from step {step}")
    tr.validate(state, max_batches=int(cfg.get("eval_max_batches", 0)) or None)


def cmd_synth_data(args):
    from visinger_tpu.data.synthetic_corpus import generate_corpus

    cfg = _resolve_config(args)
    # corpus shape from the config (configs/tpu_run.yaml synth_*) unless
    # overridden on the CLI
    n_items = args.n_items or int(cfg.get("synth_n_items", 12))
    notes = tuple(cfg.get("synth_notes", (4, 8)))
    generate_corpus(cfg.processed_data_dir, n_items=n_items,
                    sample_rate=cfg.sample_rate, notes_per_item=notes)
    print(f"| synthetic corpus at {cfg.processed_data_dir} "
          f"({n_items} items, {notes[0]}-{notes[1]} notes)")


def main(argv=None):
    p = argparse.ArgumentParser(prog="visinger_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [("train", cmd_train), ("preprocess", cmd_preprocess),
                     ("binarize", cmd_binarize), ("infer", cmd_infer),
                     ("test", cmd_test), ("validate", cmd_validate),
                     ("synth-data", cmd_synth_data), ("export", cmd_export)]:
        sp = sub.add_parser(name)
        sp.add_argument("--config", default="")
        sp.add_argument("--exp_name", default="")
        sp.add_argument("-hp", "--hparams", default="")
        sp.add_argument("--reset", action="store_true")
        sp.add_argument("--remove", action="store_true",
                        help="delete the experiment work dir (interactive "
                             "confirm) before proceeding")
        sp.add_argument("--debug", action="store_true")
        if name == "infer":
            sp.add_argument("--midi", default="")
            sp.add_argument("--midi_dir", default="",
                            help="synthesize every .mid in a directory, "
                                 "batched max_sentences at a time")
            sp.add_argument("--out", default="out.wav")
            sp.add_argument("--out_dir", default="")
            sp.add_argument("--pitch_control", type=int, default=0)
            sp.add_argument("--stream", action="store_true",
                            help="chunked streaming decode: one fixed-shape "
                                 "program for any score length "
                                 "(infer/streaming.py; = stream_infer: true)")
        if name == "synth-data":
            sp.add_argument("--n_items", type=int, default=0,
                            help="0 = from config synth_n_items (default 12)")
        if name == "export":
            sp.add_argument("--out_dir", default="exported_model")
            sp.add_argument("--batch_size", type=int, default=1)
            sp.add_argument("--platforms", default="cpu,tpu",
                            help="comma-separated lowering platforms")
            sp.add_argument("--buckets", default="",
                            help="'<tokens>x<frames>,...' shapes to export "
                                 "into one artifact (default: the largest "
                                 "configured bucket)")
        sp.set_defaults(fn=fn)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

"""CLI driver integration tests (SURVEY.md §3.1 call stack end-to-end)."""

import json
import os

import numpy as np
import pytest

from convnet_tpu.cli.main import main, build_parser


pytestmark = pytest.mark.slow


def _run(tmp_path, *extra):
    return main([
        "--dataset", "synthetic", "--model", "resnet",
        "--model-config", "{'depth': 20}",
        "-b", "16", "--epochs", "1", "--print-freq", "0",
        "--results-dir", str(tmp_path), "--save", "t",
        *extra,
    ])


def test_train_produces_artifacts(tmp_path):
    res = _run(tmp_path)
    assert "best_prec1" in res
    d = tmp_path / "t"
    for f in ("checkpoint.npz", "args.json", "log.txt", "results.csv",
              "results.json"):
        assert (d / f).exists(), f
    rows = json.loads((d / "results.json").read_text())
    assert rows[0]["epoch"] == 0
    assert np.isfinite(rows[0]["train_loss"])


def test_train_with_lars_optimizer(tmp_path):
    """--optimizer LARS engages the large-batch layer-wise optimizer
    end to end (registry → needed_slots → jitted step)."""
    res = _run(tmp_path, "--optimizer", "LARS", "--lr", "0.5")
    assert np.isfinite(res["best_prec1"])
    rows = json.loads((tmp_path / "t" / "results.json").read_text())
    assert np.isfinite(rows[0]["train_loss"])


def test_resume_continues(tmp_path):
    _run(tmp_path)
    res = main([
        "--dataset", "synthetic", "--model", "resnet",
        "--model-config", "{'depth': 20}",
        "-b", "16", "--epochs", "2", "--print-freq", "0",
        "--results-dir", str(tmp_path), "--save", "t",
        "--resume", str(tmp_path / "t"),
    ])
    rows = json.loads((tmp_path / "t" / "results.json").read_text())
    assert rows[-1]["epoch"] == 1  # resumed at epoch 1


def test_resume_restores_model_from_checkpoint(tmp_path):
    """--resume/--evaluate without --model: the checkpoint's recorded
    model name + config rebuild the trained architecture (framework
    checkpoints are self-describing; the reference requires
    re-specifying the flags)."""
    _run(tmp_path)  # trains resnet depth 20
    res = main([
        "--dataset", "synthetic",
        "-b", "16", "--epochs", "2", "--print-freq", "0",
        "--results-dir", str(tmp_path), "--save", "t",
        "--resume", str(tmp_path / "t"),
    ])
    rows = json.loads((tmp_path / "t" / "results.json").read_text())
    assert rows[-1]["epoch"] == 1
    assert np.isfinite(res["best_prec1"])
    # evaluate-only, also flag-free
    res = main([
        "--dataset", "synthetic", "-b", "16", "--print-freq", "0",
        "--results-dir", str(tmp_path), "--save", "t-eval2",
        "--evaluate", str(tmp_path / "t" / "model_best.npz"),
    ])
    assert np.isfinite(res["loss"])
    # --model-config without --model still restores the model, with the
    # explicit entries merged over the recorded config
    res = main([
        "--dataset", "synthetic", "-b", "16", "--print-freq", "0",
        "--model-config", "{'depth': 20}",
        "--results-dir", str(tmp_path), "--save", "t-eval3",
        "--evaluate", str(tmp_path / "t" / "model_best.npz"),
    ])
    assert np.isfinite(res["loss"])


def test_evaluate_checkpoint(tmp_path):
    _run(tmp_path)
    res = main([
        "--dataset", "synthetic", "--model", "resnet",
        "--model-config", "{'depth': 20}",
        "-b", "16", "--print-freq", "0",
        "--results-dir", str(tmp_path), "--save", "t-eval",
        "--evaluate", str(tmp_path / "t" / "model_best.npz"),
    ])
    assert np.isfinite(res["loss"])


def test_feature_flags_run(tmp_path):
    res = _run(tmp_path, "--mixup", "0.2", "--label-smoothing", "0.1",
               "--cutout", "--dtype", "bf16", "--grad-clip", "5",
               "--tensorwatch")
    assert "best_prec1" in res
    watch = tmp_path / "t" / "watch.jsonl"
    assert watch.exists()
    lines = [json.loads(l) for l in watch.read_text().splitlines()]
    assert lines and "loss" in lines[0]


def test_parser_covers_reference_flags():
    """The reference CLI's capability flags all exist (SURVEY.md §5.6)."""
    parser = build_parser()
    opts = {o for a in parser._actions for o in a.option_strings}
    for flag in ["--model", "--dataset", "--model-config", "--batch-size",
                 "--epochs", "--resume", "--evaluate", "--seed", "--dtype",
                 "--label-smoothing", "--mixup", "--cutmix", "--duplicates",
                 "--chunk-batch", "--grad-clip", "--adapt-grad-norm",
                 "--autoaugment", "--cutout", "--workers", "--print-freq",
                 "--save", "--results-dir", "--save-all", "--loss-scale",
                 "--sync-bn", "--dist-init", "--input-size",
                 "--momentum", "--weight-decay", "--model-ema",
                 "--allreduce-dtype"]:
        assert flag in opts, flag


def test_cli_spatial_2d_mesh(tmp_path):
    """--spatial builds the 2-D mesh and trains end-to-end."""
    res = main([
        "--dataset", "synthetic", "--model", "resnet",
        "--model-config", "{'depth': 20}",
        "-b", "16", "--epochs", "1", "--print-freq", "0",
        "--results-dir", str(tmp_path), "--save", "sp",
        "--num-devices", "8", "--spatial", "2", "--sync-bn",
    ])
    assert "best_prec1" in res
    assert (tmp_path / "sp" / "checkpoint.npz").exists()


def test_structured_synthetic_generalization(tmp_path):
    """VALIDATION accuracy (not memorization) climbs on the structured
    synthetic dataset — train/val share class prototypes but not
    samples, so this exercises true generalization through the full
    pipeline (augmentation, BN stats, eval path) with no datasets on
    disk."""
    res = main([
        "--dataset", "synthetic_structured", "--model", "resnet",
        "--model-config", "{'depth': 8}",
        "-b", "64", "--epochs", "5", "--print-freq", "0", "--lr", "0.05",
        "--results-dir", str(tmp_path), "--save", "st",
    ])
    assert res["best_prec1"] > 80.0, res


def test_cli_zero1_resume(tmp_path):
    """--shard-opt-state train → resume exercises the CLI's
    placement-preserving optimizer-state restore on the 8-device mesh."""
    zargs = ["--num-devices", "8", "--shard-opt-state", "--sync-bn"]
    _run(tmp_path, *zargs)
    main([
        "--dataset", "synthetic", "--model", "resnet",
        "--model-config", "{'depth': 20}",
        "-b", "16", "--epochs", "2", "--print-freq", "0",
        "--results-dir", str(tmp_path), "--save", "t",
        "--resume", str(tmp_path / "t"), *zargs,
    ])
    rows = json.loads((tmp_path / "t" / "results.json").read_text())
    assert rows[-1]["epoch"] == 1


def test_save_freq_preemption_resume_bitexact(tmp_path, monkeypatch):
    """--save-freq N checkpoints mid-epoch; a preempted run resumed
    from such a checkpoint replays the rest of the epoch bit-exactly
    (epoch-seeded loader + restored trainer RNG stream). Preemption is
    simulated by raising right after the first mid-epoch save."""
    import convnet_tpu.utils.checkpoint as ckpt_mod
    from convnet_tpu.utils.checkpoint import wait_for_pending_save

    cfg = ["--dataset", "synthetic", "--model", "resnet",
           "--model-config", "{'depth': 8}", "-b", "16", "--epochs", "1",
           "--print-freq", "0", "--mixup", "0.2", "--seed", "7",
           "--results-dir", str(tmp_path)]

    # ground truth: uninterrupted epoch
    main([*cfg, "--save", "full"])
    wait_for_pending_save()
    ref = ckpt_mod.load_checkpoint(str(tmp_path / "full"))

    # preempted run: die right after the batch-3 mid-epoch save
    class Preempted(Exception):
        pass

    real_save = ckpt_mod.save_checkpoint

    def dying_save(ckpt, *a, **kw):
        real_save(ckpt, *a, **kw)
        if ckpt.get("batch_idx"):
            raise Preempted()

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", dying_save)
    with pytest.raises(Preempted):
        main([*cfg, "--save", "pre", "--save-freq", "3"])
    monkeypatch.setattr(ckpt_mod, "save_checkpoint", real_save)
    wait_for_pending_save()  # the real process would join at exit
    mid = ckpt_mod.load_checkpoint(str(tmp_path / "pre"))
    assert mid["batch_idx"] == 3 and "rng" in mid

    # resume and finish the epoch
    main([*cfg, "--save", "pre", "--resume", str(tmp_path / "pre")])
    wait_for_pending_save()
    res = ckpt_mod.load_checkpoint(str(tmp_path / "pre"))
    assert res.get("batch_idx", 0) in (0, None) or "batch_idx" not in res
    assert res["training_steps"] == ref["training_steps"]
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(ref["params"]),
                    jax.tree_util.tree_leaves(res["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_with_calibrate_bn(tmp_path):
    _run(tmp_path)
    res = main([
        "--dataset", "synthetic", "--model", "resnet",
        "--model-config", "{'depth': 20}",
        "-b", "16", "--print-freq", "0",
        "--results-dir", str(tmp_path), "--save", "t-cal",
        "--evaluate", str(tmp_path / "t" / "model_best.npz"),
        "--calibrate-bn",
    ])
    assert np.isfinite(res["loss"])


def test_profile_flag_writes_trace(tmp_path):
    """--profile captures a jax.profiler trace of epoch 0 (SURVEY §5.1;
    verified working on the axon backend too, PERF_NOTES session 29)."""
    _run(tmp_path, "--profile")
    import glob
    traces = glob.glob(str(tmp_path / "t" / "profile" / "**" / "*.trace.json.gz"),
                       recursive=True)
    assert traces, "no trace file produced by --profile"


def test_elastic_resume_across_device_counts(tmp_path):
    """A checkpoint from an 8-device data-parallel run resumes on 4
    devices and on 1 device (and a ZeRO-1 sharded run re-shards to the
    new mesh): checkpoints store full arrays, and restore re-places
    them under the CURRENT mesh — world-size changes across
    preemptions must not invalidate training state."""
    base = ["--dataset", "synthetic", "--model", "resnet",
            "--model-config", "{'depth': 8}", "-b", "16",
            "--print-freq", "0", "--results-dir", str(tmp_path),
            "--save", "el"]
    main([*base, "--epochs", "1", "--num-devices", "8", "--sync-bn",
          "--shard-opt-state"])
    # shrink to 4 devices (ZeRO-1 moments re-shard 8-way -> 4-way)
    main([*base, "--epochs", "2", "--num-devices", "4", "--sync-bn",
          "--shard-opt-state", "--resume", str(tmp_path / "el")])
    # ... and down to a single device, plain data parallel
    main([*base, "--epochs", "3", "--num-devices", "1",
          "--resume", str(tmp_path / "el")])
    rows = json.loads((tmp_path / "el" / "results.json").read_text())
    # resumed runs append to the SAME curves (ResultsLog reload)
    assert [r["epoch"] for r in rows] == [0, 1, 2]
    assert all(np.isfinite(r["train_loss"]) for r in rows)


def test_compile_cache_flag(tmp_path):
    """--compile-cache populates a persistent XLA compilation cache
    (relaunch/resume skips the train-step compile)."""
    import jax
    cache = tmp_path / "xla-cache"
    try:
        _run(tmp_path, "--compile-cache", str(cache))
        entries = list(cache.iterdir())
        assert entries, "compilation cache is empty"
    finally:
        # the config is process-global and tmp_path is deleted after
        # the test — don't leave later in-process compiles pointing at
        # a dead directory
        jax.config.update("jax_compilation_cache_dir", None)


def test_resume_with_matching_model_merges_recorded_config(tmp_path):
    """--model naming the checkpoint's recorded model (without
    --model-config) must still restore the run's custom config — a
    depth-32 run resumed with plain '--model resnet' would otherwise
    rebuild the factory-default depth and fail at parameter restore."""
    _run(tmp_path, "--model-config", "{'depth': 32}")
    res = main([
        "--dataset", "synthetic", "--model", "resnet",
        "-b", "16", "--epochs", "1", "--print-freq", "0",
        "--results-dir", str(tmp_path), "--save", "t-eval-match",
        "--evaluate", str(tmp_path / "t" / "model_best.npz"),
    ])
    assert np.isfinite(res["loss"])


def test_evaluate_and_resume_restore_input_size(tmp_path):
    """Geometry is part of the checkpoint identity: a run trained at
    --input-size 24 must evaluate AND resume at 24 without the flag —
    the dataset-default geometry silently degrading accuracy (and a
    resume erasing the recorded size) was the serving/eval-disagreement
    class of bug (see commit 767be04 postmortem)."""
    from convnet_tpu.utils.checkpoint import peek_checkpoint_meta

    _run(tmp_path, "--input-size", "24")
    ckpt = str(tmp_path / "t" / "model_best.npz")
    assert peek_checkpoint_meta(ckpt)["input_size"] == 24

    res = main([
        "--dataset", "synthetic", "-b", "16", "--print-freq", "0",
        "--results-dir", str(tmp_path), "--save", "t-eval24",
        "--evaluate", ckpt,
    ])
    assert np.isfinite(res["loss"])  # geometry restored, shapes agree

    main([
        "--dataset", "synthetic", "-b", "16", "--epochs", "2",
        "--print-freq", "0", "--results-dir", str(tmp_path),
        "--save", "t24b", "--resume", ckpt,
    ])
    meta2 = peek_checkpoint_meta(str(tmp_path / "t24b" / "checkpoint.npz"))
    assert meta2["input_size"] == 24  # resume re-records, not erases

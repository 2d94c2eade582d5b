"""Preemption-safe training (VERDICT r2 #5) — the reference is fail-fast
(SURVEY §5.3: no signal handling, epoch-granular resume at best); we go
step-granular and test that a run killed mid-epoch by a REAL SIGTERM
continues bit-identically after resume."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scenenet_tpu.losses import resolve_criterion
from scenenet_tpu.models import SceneNet
from scenenet_tpu.train import TrainConfig, Trainer
from scenenet_tpu.train.preempt import (
    PreemptionGuard,
    chunk_starts,
    request_preemption,
    restore_train_snapshot,
    save_train_snapshot,
)


class _GridBox:
    def __init__(self, n, g, seed):
        rng = np.random.default_rng(seed)
        self.x = jnp.asarray((rng.random((n, 1, g, g, g)) > 0.9), jnp.uint8)
        self.y = jnp.asarray((rng.random((n, 1, g, g, g)) > 0.97), jnp.uint8)

    def __len__(self):
        return int(self.x.shape[0])


def _trainer(tmp_path, tag, **kw):
    net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=3)
    cfg = TrainConfig(checkpoint_dir=str(tmp_path / f"c{tag}"),
                      run_dir=str(tmp_path / f"r{tag}"),
                      early_stop_metric=None, log_gradients=False, **kw)
    return Trainer(net, resolve_criterion("mse")(), cfg), params


class TestChunkStarts:
    def test_partitions(self):
        assert chunk_starts(16, 4) == [(0, 4), (4, 4), (8, 4), (12, 4)]
        assert chunk_starts(10, 4) == [(0, 3), (3, 3), (6, 2), (8, 2)]
        assert chunk_starts(3, 8) == [(0, 1), (1, 1), (2, 1)]
        assert chunk_starts(5, 1) == [(0, 5)]
        for n, k in [(125, 8), (7, 3), (1, 1)]:
            cs = chunk_starts(n, k)
            assert sum(length for _, length in cs) == n
            assert cs[0][0] == 0
            assert len({length for _, length in cs}) <= 2


class TestChunkedEpochEquality:
    @pytest.mark.parametrize("augment", [False, True])
    def test_k4_matches_k1(self, tmp_path, augment):
        """Chunking the scan epoch must not change the math: K=4 and K=1
        visit the same batches in the same order with the same PRNG
        stream."""
        grids = _GridBox(48, 12, 0)
        outs = []
        for tag, k in (("a", 1), ("b", 4)):
            trainer, params = _trainer(tmp_path, tag + str(augment),
                                       max_epochs=3, epoch_chunks=k)
            final, _ = trainer.fit_grid_cached(
                params, grids, batch_size=4, augment=augment,
                key=jax.random.PRNGKey(11))
            outs.append(final)
        a, b = (jax.tree.map(np.asarray, o) for o in outs)
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(la, lb, rtol=2e-6, atol=1e-7)


class TestSnapshotRoundTrip:
    def test_save_restore(self, tmp_path):
        from scenenet_tpu.train.metrics import MetricState
        from scenenet_tpu.train.state import create_train_state

        net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=0)
        state, _ = create_train_state(params, "adam", 1e-3)
        mstate = MetricState(*(jnp.asarray([0, i], jnp.int32) for i in range(4)))
        keys = {"outer": jax.random.PRNGKey(5), "aug": jax.random.PRNGKey(9)}
        path = str(tmp_path / "snap.npz")
        save_train_snapshot(path, state, mstate, jnp.asarray(2.5), keys,
                            {"epoch": 3, "next_chunk": 2, "step": 19})
        rstate, rmstate, rloss, rkeys, cursor = restore_train_snapshot(
            path, state, keys)
        assert cursor == {"epoch": 3, "next_chunk": 2, "step": 19}
        assert float(rloss) == 2.5
        from scenenet_tpu.train.metrics import metric_counts

        assert metric_counts(rmstate) == (0, 1, 2, 3)
        np.testing.assert_array_equal(np.asarray(rkeys["outer"]),
                                      np.asarray(keys["outer"]))
        for la, lb in zip(jax.tree.leaves(jax.tree.map(np.asarray, rstate)),
                          jax.tree.leaves(jax.tree.map(np.asarray, state))):
            np.testing.assert_array_equal(la, lb)


class TestProgrammaticPreemption:
    def test_mid_epoch_resume_bit_identical_grid_cached(self, tmp_path):
        """Deterministic preemption at the FIRST chunk boundary of epoch 0
        (request flag pre-armed), then resume → final params must equal an
        uninterrupted run bit-for-bit."""
        grids = _GridBox(48, 12, 1)

        straight, params = _trainer(tmp_path, "s", max_epochs=3, epoch_chunks=4)
        want, _ = straight.fit_grid_cached(params, grids, batch_size=4,
                                           augment=True,
                                           key=jax.random.PRNGKey(4))

        t1, params1 = _trainer(tmp_path, "k", max_epochs=3, epoch_chunks=4)
        request_preemption()
        t1.fit_grid_cached(params1, grids, batch_size=4, augment=True,
                           key=jax.random.PRNGKey(4))
        assert t1.preempted
        snap = os.path.join(t1.config.checkpoint_dir, "preempt.npz")
        assert os.path.exists(snap)
        with open(snap.replace(".npz", ".json")) as f:
            cursor = json.load(f)["cursor"]
        assert cursor == {"kind": "chunk", "epoch": 0, "next_chunk": 1,
                          "n_chunks": 4, "step": 3}

        t2, params2 = _trainer(tmp_path, "k2", max_epochs=3, epoch_chunks=4)
        got, _ = t2.fit_grid_cached(params2, grids, batch_size=4, augment=True,
                                    key=jax.random.PRNGKey(4),
                                    resume_from=snap)
        for la, lb in zip(jax.tree.leaves(jax.tree.map(np.asarray, got)),
                          jax.tree.leaves(jax.tree.map(np.asarray, want))):
            np.testing.assert_array_equal(la, lb)

    def test_mid_epoch_resume_fit_cached(self, tmp_path):
        """Same property through the point-cache path (revoxelization +
        point-space augmentation PRNG carried across the preemption)."""
        from scenenet_tpu.data.device_cache import DevicePointCache
        from scenenet_tpu.train import make_device_voxelize_prep

        rng = np.random.default_rng(6)
        dataset = [
            (rng.random((256, 3)).astype(np.float32) * 10.0,
             rng.integers(0, 20, 256).astype(np.int32),
             np.ones(256, bool))
            for _ in range(24)
        ]
        synth_cache = DevicePointCache(dataset)
        prep = make_device_voxelize_prep((12, 12, 12), (15,))

        def trainer(tag, **kw):
            net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=3)
            cfg = TrainConfig(checkpoint_dir=str(tmp_path / f"c{tag}"),
                              run_dir=str(tmp_path / f"r{tag}"),
                              early_stop_metric=None, log_gradients=False,
                              max_epochs=2, epoch_chunks=3, **kw)
            return Trainer(net, resolve_criterion("mse")(), cfg,
                           batch_prep=prep), params

        straight, params = trainer("s")
        want, _ = straight.fit_cached(params, synth_cache, batch_size=4,
                                      augment=True, key=jax.random.PRNGKey(8))

        t1, params1 = trainer("k")
        request_preemption()
        t1.fit_cached(params1, synth_cache, batch_size=4, augment=True,
                      key=jax.random.PRNGKey(8))
        assert t1.preempted
        snap = os.path.join(t1.config.checkpoint_dir, "preempt.npz")

        t2, params2 = trainer("k2")
        got, _ = t2.fit_cached(params2, synth_cache, batch_size=4,
                               augment=True, key=jax.random.PRNGKey(8),
                               resume_from=snap)
        for la, lb in zip(jax.tree.leaves(jax.tree.map(np.asarray, got)),
                          jax.tree.leaves(jax.tree.map(np.asarray, want))):
            np.testing.assert_array_equal(la, lb)

    def test_fit_batch_path_resume(self, tmp_path):
        """Per-batch loader path: SIGTERM-style stop after a step +
        periodic snapshots, resume continues to the same final params
        (list loader → identical batch sequence per epoch)."""
        rng = np.random.default_rng(2)
        batches = [
            ((rng.random((2, 1, 12, 12, 12)) > 0.9).astype(np.float32),
             (rng.random((2, 1, 12, 12, 12)) > 0.97).astype(np.float32))
            for _ in range(6)
        ]

        straight, params = _trainer(tmp_path, "fs", max_epochs=2)
        want, _ = straight.fit(params, batches)

        t1, params1 = _trainer(tmp_path, "fk", max_epochs=2,
                               checkpoint_every_n_steps=1)
        request_preemption()
        t1.fit(params1, batches)
        assert t1.preempted
        snap = os.path.join(t1.config.checkpoint_dir, "preempt.npz")
        with open(snap.replace(".npz", ".json")) as f:
            cursor = json.load(f)["cursor"]
        assert cursor["epoch"] == 0 and cursor["next_batch"] == 1

        t2, params2 = _trainer(tmp_path, "fk2", max_epochs=2)
        got, _ = t2.fit(params2, batches, resume_from=snap)
        for la, lb in zip(jax.tree.leaves(jax.tree.map(np.asarray, got)),
                          jax.tree.leaves(jax.tree.map(np.asarray, want))):
            np.testing.assert_array_equal(la, lb)


_WORKER = r'''
import os, sys, types
import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins a TPU plugin
mode, workdir = sys.argv[1], sys.argv[2]

import numpy as np
import jax.numpy as jnp

from scenenet_tpu.losses import resolve_criterion
from scenenet_tpu.models import SceneNet
from scenenet_tpu.train import TrainConfig, Trainer
from scenenet_tpu.train.checkpoint import save_checkpoint


class GridBox:
    def __init__(self, n, g, seed):
        rng = np.random.default_rng(seed)
        self.x = jnp.asarray((rng.random((n, 1, g, g, g)) > 0.9), jnp.uint8)
        self.y = jnp.asarray((rng.random((n, 1, g, g, g)) > 0.97), jnp.uint8)

    def __len__(self):
        return int(self.x.shape[0])


grids = GridBox(48, 12, 1)
net, params = SceneNet.create(kernel_size=(9, 5, 5), seed=3)
cfg = TrainConfig(checkpoint_dir=os.path.join(workdir, "ckpt"),
                  run_dir=os.path.join(workdir, "run"),
                  early_stop_metric=None, log_gradients=False,
                  max_epochs=150, epoch_chunks=4)
trainer = Trainer(net, resolve_criterion("mse")(), cfg)
snap = os.path.join(cfg.checkpoint_dir, "preempt.npz")
resume = snap if (mode == "resume" and os.path.exists(snap)) else None
final, _ = trainer.fit_grid_cached(params, grids, batch_size=4, augment=True,
                                   key=jax.random.PRNGKey(4),
                                   resume_from=resume)
save_checkpoint(os.path.join(workdir, "final.npz"), final)
sys.exit(85 if trainer.preempted else 0)
'''


@pytest.mark.slow
class TestRealSigtermKill:
    def test_kill_resume_bit_identical(self, tmp_path):
        """A REAL process receives SIGTERM mid-training, flushes a
        snapshot, and dies; a fresh process resumes and must land on
        bit-identical final params vs a never-killed process."""
        worker = tmp_path / "worker.py"
        worker.write_text(_WORKER)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")

        def launch(mode, workdir):
            os.makedirs(workdir, exist_ok=True)
            return subprocess.Popen(
                [sys.executable, str(worker), mode, str(workdir)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

        # straight run (no kill) — the golden params
        wd_s = str(tmp_path / "straight")
        p = launch("train", wd_s)
        out, _ = p.communicate(timeout=420)
        assert p.returncode == 0, out[-3000:]

        # killed run: SIGTERM once a few epochs are logged (mid-training)
        wd_k = str(tmp_path / "killed")
        p = launch("train", wd_k)
        metrics = os.path.join(wd_k, "run", "metrics.jsonl")
        deadline = time.time() + 300
        while time.time() < deadline:
            if os.path.exists(metrics):
                with open(metrics) as f:
                    if sum(1 for _ in f) >= 3:
                        break
            if p.poll() is not None:
                break
            time.sleep(0.02)
        assert p.poll() is None, "worker finished before SIGTERM landed " \
            "(raise max_epochs)\n" + (p.communicate()[0] or "")[-2000:]
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=120)
        assert p.returncode == 85, f"rc={p.returncode}\n{out[-3000:]}"
        assert os.path.exists(os.path.join(wd_k, "ckpt", "preempt.npz"))

        # resume in a fresh process
        p = launch("resume", wd_k)
        out, _ = p.communicate(timeout=420)
        assert p.returncode == 0, out[-3000:]

        a = np.load(os.path.join(wd_s, "final.npz"))
        b = np.load(os.path.join(wd_k, "final.npz"))
        assert sorted(a.files) == sorted(b.files)
        for k in a.files:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


class TestSnapshotLifecycle:
    """Round-3 hardening: a snapshot must never hijack a LATER run —
    consumed/periodic snapshots are discarded on normal completion, and an
    unusable snapshot (corrupt file, different fit pipeline) degrades to a
    fresh start instead of a crash at resume time."""

    def test_discarded_after_completed_scan_fit(self, tmp_path):
        grids = _GridBox(16, 12, 1)
        t, params = _trainer(tmp_path, "d", max_epochs=2, epoch_chunks=2,
                             checkpoint_every_n_steps=1)
        t.fit_grid_cached(params, grids, batch_size=4, augment=False,
                          key=jax.random.PRNGKey(0))
        assert not t.preempted
        # periodic snapshots were written during the run, then cleaned up
        snap = os.path.join(t.config.checkpoint_dir, "preempt.npz")
        assert not os.path.exists(snap)
        assert not os.path.exists(snap.replace(".npz", ".json"))

    def test_discarded_after_completed_batch_fit(self, tmp_path):
        rng = np.random.default_rng(0)
        batches = [((rng.random((2, 1, 12, 12, 12)) > 0.9).astype(np.float32),
                    (rng.random((2, 1, 12, 12, 12)) > 0.97).astype(np.float32))
                   for _ in range(4)]
        t, params = _trainer(tmp_path, "db", max_epochs=1,
                             checkpoint_every_n_steps=2)
        t.fit(params, batches)
        assert not t.preempted
        assert not os.path.exists(
            os.path.join(t.config.checkpoint_dir, "preempt.npz"))

    def test_corrupt_snapshot_starts_fresh(self, tmp_path, capsys):
        """A SIGKILL can truncate the write of an older (pre-atomic)
        snapshot; auto-resume must not crash-loop on it."""
        grids = _GridBox(16, 12, 1)
        t, params = _trainer(tmp_path, "c", max_epochs=1, epoch_chunks=2)
        snap = os.path.join(t.config.checkpoint_dir, "preempt.npz")
        os.makedirs(t.config.checkpoint_dir, exist_ok=True)
        with open(snap, "wb") as f:
            f.write(b"PK\x03\x04 truncated garbage")
        with open(snap.replace(".npz", ".json"), "w") as f:
            f.write("{")
        final, _ = t.fit_grid_cached(params, grids, batch_size=4,
                                     augment=False,
                                     key=jax.random.PRNGKey(0),
                                     resume_from=snap)
        assert "unusable" in capsys.readouterr().out
        assert final is not None

    def test_cross_pipeline_snapshot_starts_fresh(self, tmp_path, capsys):
        """A 'chunk' (scan-path) snapshot resumed through the per-batch fit
        (e.g. device_cache: auto resolving differently across launches)
        must fall back to a fresh run, not KeyError on the cursor."""
        grids = _GridBox(16, 12, 1)
        t1, params1 = _trainer(tmp_path, "x1", max_epochs=2, epoch_chunks=2)
        request_preemption()
        t1.fit_grid_cached(params1, grids, batch_size=4, augment=False,
                           key=jax.random.PRNGKey(0))
        assert t1.preempted
        snap = os.path.join(t1.config.checkpoint_dir, "preempt.npz")
        assert os.path.exists(snap)

        rng = np.random.default_rng(0)
        batches = [((rng.random((2, 1, 12, 12, 12)) > 0.9).astype(np.float32),
                    (rng.random((2, 1, 12, 12, 12)) > 0.97).astype(np.float32))
                   for _ in range(3)]
        t2, params2 = _trainer(tmp_path, "x2", max_epochs=1)
        final, _ = t2.fit(params2, batches, resume_from=snap)
        out = capsys.readouterr().out
        assert "'chunk' fit pipeline" in out
        assert final is not None

    def test_save_checkpoint_is_atomic(self, tmp_path):
        """save_checkpoint goes through a temp name + os.replace: after a
        save, no temp residue exists and the file round-trips."""
        from scenenet_tpu.train.checkpoint import (
            restore_checkpoint, save_checkpoint,
        )

        tree = {"a": np.arange(5.0), "b": {"c": np.float32(2.5)}}
        path = str(tmp_path / "atomic.npz")
        save_checkpoint(path, tree, metadata={"step": 7})
        assert not [f for f in os.listdir(tmp_path) if ".tmp" in f]
        got = restore_checkpoint(path, tree)
        np.testing.assert_array_equal(got["a"], tree["a"])
        assert json.load(open(str(tmp_path / "atomic.json")))["step"] == 7


class TestChunkGeometryGuard:
    def test_changed_epoch_chunks_starts_fresh(self, tmp_path, capsys):
        """A next_chunk cursor is meaningless against a different chunk
        partition (epoch_chunks changed between launches) — resume must
        start fresh, not skip/duplicate batches."""
        grids = _GridBox(16, 12, 1)
        t1, params1 = _trainer(tmp_path, "g1", max_epochs=2, epoch_chunks=4)
        request_preemption()
        t1.fit_grid_cached(params1, grids, batch_size=4, augment=False,
                           key=jax.random.PRNGKey(0))
        snap = os.path.join(t1.config.checkpoint_dir, "preempt.npz")
        assert os.path.exists(snap)

        t2, params2 = _trainer(tmp_path, "g2", max_epochs=1, epoch_chunks=2)
        final, _ = t2.fit_grid_cached(params2, grids, batch_size=4,
                                      augment=False,
                                      key=jax.random.PRNGKey(0),
                                      resume_from=snap)
        assert "chunk partition" in capsys.readouterr().out
        assert final is not None

    def test_changed_model_shape_starts_fresh(self, tmp_path, capsys):
        """restore_checkpoint now validates shapes, so a stale snapshot of
        a differently-shaped model is rejected instead of silently loading
        old-architecture kernels."""
        grids = _GridBox(16, 12, 1)
        t1, params1 = _trainer(tmp_path, "m1", max_epochs=2, epoch_chunks=2)
        request_preemption()
        t1.fit_grid_cached(params1, grids, batch_size=4, augment=False,
                           key=jax.random.PRNGKey(0))
        snap = os.path.join(t1.config.checkpoint_dir, "preempt.npz")

        from scenenet_tpu.losses import resolve_criterion as _rc
        net2, params2 = SceneNet.create({"cy": 2, "cone": 1, "neg": 1},
                                        kernel_size=(9, 5, 5), seed=3)
        cfg = TrainConfig(checkpoint_dir=str(tmp_path / "cm2"),
                          run_dir=str(tmp_path / "rm2"),
                          early_stop_metric=None, log_gradients=False,
                          max_epochs=1, epoch_chunks=2)
        t2 = Trainer(net2, _rc("mse")(), cfg)
        final, _ = t2.fit_grid_cached(params2, grids, batch_size=4,
                                      augment=False,
                                      key=jax.random.PRNGKey(0),
                                      resume_from=snap)
        assert "unusable" in capsys.readouterr().out
        assert final is not None

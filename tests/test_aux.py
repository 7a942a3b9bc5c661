"""Aux subsystem tests: profiling meters, NaN guard, PLY export, visualisation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gm3d_tpu.models import GM3DStudent, PointMAE
from gm3d_tpu.utils.debug import check_finite_loss
from gm3d_tpu.utils.meters import AverageMeter, MetricLogger, SmoothedValue
from gm3d_tpu.utils.ply import loss_heatmap_ply, write_ply
from gm3d_tpu.utils.profiling import StepTimer

SMALL = dict(trans_dim=48, depth=1, num_heads=2, decoder_depth=1, decoder_num_heads=2,
             group_size=8, num_group=16, encoder_dims=48)


class TestMeters:
    def test_smoothed_value(self):
        v = SmoothedValue(window_size=3)
        for x in [1, 2, 3, 4]:
            v.update(x)
        assert v.avg == 3.0  # window [2,3,4]
        assert v.global_avg == 2.5
        assert v.value == 4

    def test_metric_logger(self):
        m = MetricLogger()
        m.update(loss=1.0)
        m.update(loss=3.0)
        assert m.global_avgs()["loss"] == 2.0

    def test_average_meter_multi(self):
        a = AverageMeter(["x", "y"])
        a.update([1, 10])
        a.update([3, 30])
        assert a.avg(0) == 2.0
        assert a.avg(1) == 20.0


class TestDebug:
    def test_finite_passes(self):
        assert check_finite_loss(1.23)

    def test_nan_detected_no_exit(self):
        assert not check_finite_loss(float("nan"), exit_on_nan=False)

    def test_nan_exits(self):
        with pytest.raises(SystemExit):
            check_finite_loss(float("inf"), exit_on_nan=True)


class TestTimer:
    def test_step_timer(self):
        t = StepTimer()
        for _ in range(3):
            t.data_ready()
            t.step_done(jnp.ones(4))
        s = t.summary()
        assert s["steps"] == 3
        assert s["iter_time_avg"] > 0


class TestPly:
    def test_write_ply(self, tmp_path):
        p = str(tmp_path / "a.ply")
        write_ply(p, np.zeros((5, 3)), np.full((5, 3), 128, np.uint8))
        text = open(p).read()
        assert "element vertex 5" in text
        assert text.count("\n") == 10 + 5  # header lines + points

    def test_heatmap(self, tmp_path):
        p = str(tmp_path / "h.ply")
        loss_heatmap_ply(p, np.random.randn(4, 6, 3), np.arange(4.0))
        assert "element vertex 24" in open(p).read()


class TestVisualization:
    def test_reconstruction_and_heatmap_dumps(self, tmp_path):
        from gm3d_tpu.eval.visualize import dump_loss_heatmap, dump_reconstruction

        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
        model = PointMAE(**SMALL)
        mask = jnp.zeros((2, 16), bool).at[:, :9].set(True)
        variables = model.init(jax.random.key(0), pts, mask, 9)
        dump_reconstruction(model, variables, pts, mask, 9, str(tmp_path))
        assert os.path.exists(tmp_path / "vis_0.ply")

        student = GM3DStudent(**SMALL)
        svars = student.init(jax.random.key(0), pts, mask, 9)
        dump_loss_heatmap(student, svars, pts, str(tmp_path))
        assert os.path.exists(tmp_path / "heat_1.ply")

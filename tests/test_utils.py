"""Utils + parallel module tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from dtt.parallel import data_mesh, data_sharded, global_mesh, replicated
from dtt.utils.logging import MetricLogger, read_metrics
from dtt.utils.profiling import StepTimer, annotate


def test_metric_logger_jsonl(tmp_path):
    lg = MetricLogger(str(tmp_path))
    lg.log(1, {"loss": 2.0})
    lg.log(2, {"loss": 1.0}, prefix="train/")
    rows = read_metrics(os.path.join(str(tmp_path), "metrics.jsonl"))
    assert rows[0]["loss"] == 2.0 and rows[0]["step"] == 1
    assert rows[1]["train/loss"] == 1.0
    lg.close()


def test_metric_logger_tensorboard(tmp_path):
    lg = MetricLogger(str(tmp_path), use_tensorboard=True)
    lg.log(1, {"loss": 3.0})
    lg.close()
    tb_dir = os.path.join(str(tmp_path), "tb")
    if os.path.isdir(tb_dir):  # torch SummaryWriter available
        assert any(f.startswith("events") for f in os.listdir(tb_dir))


def test_step_timer():
    st = StepTimer(warmup=1)
    x = jnp.ones((128, 128))
    f = jax.jit(lambda a: a @ a)
    for _ in range(4):
        with st.step(result_to_block=f(x)):
            pass
    s = st.summary()
    assert s["steps"] == 3 and s["mean_s"] >= 0


def test_trace_annotation_works_under_jit():
    with annotate("test-block"):
        out = jax.jit(lambda x: x * 2)(jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(out), 2.0)


def test_meshes():
    mesh = data_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.size == jax.device_count()
    g = global_mesh(model_parallel=2)
    assert g.axis_names == ("data", "model")
    assert g.shape["data"] * g.shape["model"] == jax.device_count()
    x = jnp.arange(jax.device_count() * 4.0).reshape(jax.device_count(), 4)
    xs = jax.device_put(x, data_sharded(mesh))
    assert len(xs.sharding.device_set) == jax.device_count()
    xr = jax.device_put(x, replicated(mesh))
    np.testing.assert_array_equal(np.asarray(xr), np.asarray(x))

"""Foundation tests: config round-trip, mesh creation, partition rules, logger."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vivqa_tpu.config.base import ConfigBase, merge_cli_overrides
from vivqa_tpu.parallel import (MeshConfig, batch_sharding, create_mesh,
                                shard_pytree_by_rules)
from vivqa_tpu.parallel.mesh import spec_for_path
from vivqa_tpu.utils import PipelineLogger, set_seed


@dataclasses.dataclass(frozen=True)
class _Inner(ConfigBase):
    dim: int = 8
    name: str = "x"


@dataclasses.dataclass(frozen=True)
class _Outer(ConfigBase):
    lr: float = 1e-3
    inner: _Inner = dataclasses.field(default_factory=_Inner)
    tags: tuple = ()


def test_config_roundtrip(tmp_path):
    cfg = _Outer(lr=0.5, inner=_Inner(dim=16), tags=("a", "b"))
    d = cfg.to_dict()
    assert d["inner"]["dim"] == 16
    cfg2 = _Outer.from_dict(d)
    assert cfg2.inner.dim == 16 and cfg2.lr == 0.5
    p = tmp_path / "c.yaml"
    cfg.to_yaml(p)
    cfg3 = _Outer.from_yaml(p)
    assert cfg3 == cfg


def test_config_coercion_and_unknown_keys():
    cfg = _Outer.from_dict({"lr": "0.25", "inner": {"dim": "32"}, "bogus": 1})
    assert cfg.lr == 0.25 and cfg.inner.dim == 32


def test_cli_overrides_nested():
    cfg = _Outer()
    out = merge_cli_overrides(cfg, {"lr": 0.9, "inner.dim": 64, "unset": None})
    assert out.lr == 0.9 and out.inner.dim == 64
    # None values skipped
    assert merge_cli_overrides(cfg, {"lr": None}) == cfg


def test_mesh_creation():
    mesh = create_mesh(MeshConfig(data_axis=-1, model_axis=2))
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())
    assert mesh.shape["model"] == 2


def test_mesh_bad_shape():
    with pytest.raises(AssertionError):
        create_mesh(MeshConfig(data_axis=3, model_axis=3))


def test_partition_rules(mesh8):
    # MLP up-projection: hidden dim sharded over model axis
    spec = spec_for_path("encoder/layers_0/mlp/wi/kernel", (128, 512), mesh8)
    assert spec == P(None, "model")
    spec = spec_for_path("encoder/layers_0/mlp/wo/kernel", (512, 128), mesh8)
    assert spec == P("model", None)
    # Attention out-proj
    spec = spec_for_path("decoder/layers_1/self_attn/out/kernel", (128, 128), mesh8)
    assert spec == P("model", None)
    # Expert stack
    spec = spec_for_path("moe/experts/w_in", (4, 128, 256), mesh8)
    assert spec == P("model", None, None)
    # Non-divisible dims fall back to replication
    spec = spec_for_path("encoder/layers_0/mlp/wi/kernel", (128, 127), mesh8)
    assert spec == P()
    # Unmatched paths replicate
    assert spec_for_path("layer_norm/scale", (128,), mesh8) == P()


def test_shard_pytree_and_put(mesh8):
    tree = {
        "mlp": {"wi": {"kernel": jnp.zeros((16, 64))}},
        "ln": {"scale": jnp.ones((16,))},
    }
    shardings = shard_pytree_by_rules(tree, mesh8)
    assert shardings["mlp"]["wi"]["kernel"].spec == P(None, "model")
    placed = jax.device_put(tree, shardings)
    assert placed["mlp"]["wi"]["kernel"].sharding.spec == P(None, "model")


def test_batch_sharding_put(mesh8):
    x = np.zeros((8, 4), np.float32)
    arr = jax.device_put(x, batch_sharding(mesh8))
    assert arr.sharding.spec == P("data")


def test_seeding_deterministic():
    k1 = set_seed(42)
    a = jax.random.normal(k1, (4,))
    k2 = set_seed(42)
    b = jax.random.normal(k2, (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_logger(tmp_path, capsys):
    log = PipelineLogger("test", log_dir=tmp_path)
    log.section("SECTION")
    log.table(("a", "b"), [(1, 2), (3, 44)])
    log.start_stage("s1")
    dt = log.end_stage("s1")
    assert dt >= 0
    log.save_stats(tmp_path / "stats.json")
    assert (tmp_path / "stats.json").exists()
    out = capsys.readouterr().out
    assert "SECTION" in out and "[ok]" in out


def test_profiling_time_chained():
    from vivqa_tpu.utils.profiling import measure_rtt, time_chained
    import jax.numpy as jnp

    def fn(x):
        return x @ x.T

    x = jnp.ones((64, 64))
    per = time_chained(fn, (x,), steps=5)
    assert per > 0
    rtt = measure_rtt(x)
    assert rtt >= 0


def test_profiling_time_train_steps():
    import jax
    import jax.numpy as jnp
    import optax
    from vivqa_tpu.train import TrainState, make_train_step
    from vivqa_tpu.utils.profiling import time_train_steps

    def apply_fn(variables, x):
        return {"y": x @ variables["params"]["w"]}

    params = {"w": jnp.ones((4, 4))}
    tx = optax.sgd(0.1)
    state = TrainState.create(apply_fn, params, tx, jax.random.PRNGKey(0))

    def loss_fn(params, batch, rng, apply_fn):
        out = apply_fn({"params": params}, batch["x"])
        return (out["y"] ** 2).sum(), {}

    per = time_train_steps(make_train_step(loss_fn), state,
                           {"x": jnp.ones((2, 4))}, steps=3)
    assert per > 0

"""Shape DiT + Shape VAE + sharded training tests (tiny configs, CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.models.dit import (
    DiTConfig,
    ShapeDiT,
    flow_matching_loss,
    sample,
    timestep_shift,
)
from regen3d_tpu.models.shapevae import (
    ShapeDecoder,
    ShapeEncoder,
    ShapeVAEConfig,
    decode_grid,
)


@pytest.fixture(scope="module")
def tiny_dit():
    cfg = DiTConfig.tiny()
    model = ShapeDiT(cfg)
    x = jnp.zeros((2, cfg.latent_tokens, cfg.latent_dim))
    t = jnp.asarray([0.1, 0.9])
    cond = jnp.zeros((2, 8, cfg.cond_dim))
    params = model.init(jax.random.PRNGKey(0), x, t, cond)
    return cfg, model, params


class TestShapeDiT:
    def test_forward_shape_and_finite(self, tiny_dit, rng):
        cfg, model, params = tiny_dit
        x = jnp.asarray(rng.normal(size=(2, cfg.latent_tokens, cfg.latent_dim)),
                        dtype=jnp.float32)
        t = jnp.asarray([0.3, 0.7])
        cond = jnp.asarray(rng.normal(size=(2, 8, cfg.cond_dim)), dtype=jnp.float32)
        v = model.apply(params, x, t, cond)
        assert v.shape == x.shape
        assert np.all(np.isfinite(np.asarray(v)))

    def test_zero_init_output(self, tiny_dit):
        """AdaLN-Zero: freshly initialized DiT predicts ~0 velocity."""
        cfg, model, params = tiny_dit
        x = jnp.ones((1, cfg.latent_tokens, cfg.latent_dim))
        v = model.apply(params, x, jnp.asarray([0.5]),
                        jnp.ones((1, 8, cfg.cond_dim)))
        assert float(jnp.abs(v).max()) < 1e-5

    def test_loss_and_grads(self, tiny_dit, rng):
        cfg, model, params = tiny_dit
        x0 = jnp.asarray(rng.normal(size=(2, cfg.latent_tokens, cfg.latent_dim)),
                         dtype=jnp.float32)
        cond = jnp.asarray(rng.normal(size=(2, 8, cfg.cond_dim)), dtype=jnp.float32)
        loss, grads = jax.value_and_grad(
            lambda p: flow_matching_loss(model, p, jax.random.PRNGKey(1), x0, cond)
        )(params)
        assert np.isfinite(float(loss))
        gn = jax.tree.reduce(lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads, 0.0)
        assert gn > 0

    def test_sampler_runs(self, tiny_dit, rng):
        cfg, model, params = tiny_dit
        cond = jnp.asarray(rng.normal(size=(1, 8, cfg.cond_dim)), dtype=jnp.float32)
        lat = sample(model, params, jax.random.PRNGKey(2), cond,
                     num_steps=4, guidance_scale=2.0)
        assert lat.shape == (1, cfg.latent_tokens, cfg.latent_dim)
        assert np.all(np.isfinite(np.asarray(lat)))

    def test_timestep_shift_monotone(self):
        t = jnp.linspace(0, 1, 11)
        s = timestep_shift(t, 3.0)
        assert float(s[0]) == 0 and float(s[-1]) == pytest.approx(1.0)
        assert np.all(np.diff(np.asarray(s)) > 0)


class TestShapeVAE:
    def test_encode_decode_shapes(self, rng):
        cfg = ShapeVAEConfig.tiny()
        enc, dec = ShapeEncoder(cfg), ShapeDecoder(cfg)
        pts = jnp.asarray(rng.normal(size=(2, 64, 3)), dtype=jnp.float32)
        ep = enc.init(jax.random.PRNGKey(0), pts)
        lat = enc.apply(ep, pts)
        assert lat.shape == (2, cfg.latent_tokens, cfg.latent_dim)
        q = jnp.asarray(rng.normal(size=(2, 33, 3)), dtype=jnp.float32)
        dp = dec.init(jax.random.PRNGKey(1), lat, q)
        sdf = dec.apply(dp, lat, q)
        assert sdf.shape == (2, 33)
        assert np.all(np.isfinite(np.asarray(sdf)))

    def test_grid_decode(self, rng):
        cfg = ShapeVAEConfig.tiny()
        dec = ShapeDecoder(cfg)
        lat = jnp.asarray(rng.normal(size=(1, cfg.latent_tokens, cfg.latent_dim)),
                          dtype=jnp.float32)
        dp = dec.init(jax.random.PRNGKey(1), lat, jnp.zeros((1, 4, 3)))
        vol = decode_grid(dec, dp, lat, resolution=8, chunk=64)
        assert vol.shape == (8, 8, 8)
        assert np.all(np.isfinite(np.asarray(vol)))


class TestShardedTraining:
    def test_dryrun_multichip_8(self, devices):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)

    def test_entry_signature(self):
        """entry() must be jit-compilable (tiny stand-in config check is done
        via dryrun; here we only validate the callable contract cheaply)."""
        import __graft_entry__
        assert callable(__graft_entry__.entry)

    def test_mesh_construction(self, devices):
        from regen3d_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(8)
        assert mesh.shape["dp"] * mesh.shape["tp"] == 8
        assert mesh.shape["tp"] == 4

    def test_partition_rules(self):
        from jax.sharding import PartitionSpec as P
        from regen3d_tpu.parallel.mesh import partition_spec_for
        assert partition_spec_for("block0/attn/q/kernel") == P(None, "tp")
        assert partition_spec_for("block0/attn/proj/kernel") == P("tp", None)
        assert partition_spec_for("block0/mlp/fc2/kernel") == P("tp", None)
        assert partition_spec_for("latent_pos") == P()

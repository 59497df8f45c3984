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


class TestCrossInstance:
    """MIDI multi-instance attention (run_midi.py:36-43 role)."""

    def test_zero_gate_identity_with_plain_dit(self):
        """At init the gates are zero, so a cross_instance model with the
        plain DiT's weights grafted in produces IDENTICAL outputs — a
        converted single-instance checkpoint loads unchanged."""
        import dataclasses

        c0 = DiTConfig.tiny()
        c1 = dataclasses.replace(c0, cross_instance=True)
        m0, m1 = ShapeDiT(c0), ShapeDiT(c1)
        x = jnp.ones((2, c0.latent_tokens, c0.latent_dim)) * 0.3
        t = jnp.asarray([0.25, 0.75])
        cond = jnp.ones((2, 4, c0.cond_dim)) * 0.1
        p1 = m1.init(jax.random.PRNGKey(0), x, t, cond)
        # graft the shared leaves into a plain-dit tree
        shared = {k: v for k, v in p1["params"].items()
                  if not k.startswith("inst_")}
        y0 = m0.apply({"params": shared}, x, t, cond)
        y1 = m1.apply(p1, x, t, cond)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   atol=1e-6)

    def test_instances_couple_when_gated(self):
        """With a nonzero gate, instance 0's output depends on instance
        1's latent — the joint multi-instance denoising is real."""
        import dataclasses

        c = dataclasses.replace(DiTConfig.tiny(), cross_instance=True)
        m = ShapeDiT(c)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, c.latent_tokens, c.latent_dim)),
                        jnp.float32)
        t = jnp.asarray([0.5, 0.5])
        cond = jnp.zeros((2, 4, c.cond_dim))
        p = m.init(jax.random.PRNGKey(0), x, t, cond)
        def surge(kp, v):
            keys = [str(getattr(k, "key", k)) for k in kp]
            if any("inst_gate" in k for k in keys):
                return jnp.ones_like(v)
            # x_out is zero-init (AdaLN-Zero); un-zero it so coupling can
            # reach the output
            if "x_out" in keys and keys[-1] == "kernel":
                return jnp.ones_like(v) * 0.01
            return v

        p = jax.tree_util.tree_map_with_path(surge, p)
        y_a = m.apply(p, x, t, cond)
        x2 = x.at[1].add(1.0)       # perturb ONLY instance 1
        y_b = m.apply(p, x2, t, cond)
        assert not np.allclose(np.asarray(y_a[0]), np.asarray(y_b[0])), \
            "instance 0 unaffected by instance 1 — no cross-instance attention"

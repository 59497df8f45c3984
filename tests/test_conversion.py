"""Weight-conversion rule tables: completeness + shape round-trips.

For each family: build a SYNTHETIC upstream-layout state_dict from our tiny
init (the rule table's inverse), run it through the forward rules, and check
the result covers our architecture leaf-for-leaf with matching shapes.
strict=True also proves no upstream key goes unmapped (DROP rules count)."""

import os

import numpy as np
import pytest

from regen3d_tpu.models import conversion


@pytest.mark.parametrize("family", sorted(conversion.FAMILIES))
def test_rule_table_roundtrip(family):
    errors = conversion.selftest(family)
    assert errors == [], f"{family}: {errors[:10]}"


@pytest.mark.parametrize("family", sorted(conversion.FAMILIES))
def test_synthetic_state_is_torch_layout(family):
    """Synthetic states must look like torch state_dicts: flat dot-keys,
    linear weights transposed relative to our kernels."""
    if conversion.FAMILIES[family].status == "diverged":
        with pytest.raises(NotImplementedError, match="diverges"):
            conversion.FAMILIES[family].rules()
        return
    state, init = conversion.synthetic_state(family)
    assert all("." in k or k.count("/") == 0 for k in state)
    assert all(isinstance(v, np.ndarray) for v in state.values())
    assert len(state) > 0


def test_converted_values_roundtrip_exactly():
    """Values (not just shapes) survive the torch→flax round trip."""
    from regen3d_tpu.models.weights import convert_state_dict
    state, init = conversion.synthetic_state("lpips")
    tree = convert_state_dict(state, conversion.lpips_rules(), strict=True)
    flat_ours = conversion._flatten(init)
    flat_conv = conversion._flatten(tree)
    for path, want in flat_ours.items():
        np.testing.assert_array_equal(flat_conv[path], want,
                                      err_msg="/".join(path))


def test_dust3r_qkv_split_order():
    """The fused-qkv split must assign rows to q, k, v in that order."""
    from regen3d_tpu.models.weights import convert_state_dict
    state, init = conversion.synthetic_state("dust3r")
    tree = convert_state_dict(state, conversion.dust3r_rules(), strict=True)
    flat_ours = conversion._flatten(init)
    flat_conv = conversion._flatten(tree)
    for path, want in flat_ours.items():
        np.testing.assert_array_equal(flat_conv[path], want,
                                      err_msg="/".join(path))


def test_strict_mode_rejects_unknown_keys():
    from regen3d_tpu.models.weights import convert_state_dict
    with pytest.raises(KeyError):
        convert_state_dict({"totally.unknown.key": np.zeros(3)},
                           conversion.sam_rules(), strict=True)


def test_activation_fixture_runner(tmp_path):
    """The fixture format runs (with a trivial identity 'model')."""
    p = str(tmp_path / "fx.npz")
    np.savez(p, input_x=np.ones((2, 3)), expected_y=np.ones((2, 3)) * 2)
    conversion.check_activation_fixture(
        "toy", p, lambda x: {"y": x * 2})
    with pytest.raises(AssertionError):
        conversion.check_activation_fixture(
            "toy", p, lambda x: {"y": x * 3})


class TestActivationFixtureHarness:
    """The recorded-activation parity harness must work the moment a
    checkpoint + upstream recording lands (VERDICT: make parity
    falsifiable). Proven here end to end with a self-recorded fixture."""

    def test_fixture_roundtrip_passes_and_detects_mismatch(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from regen3d_tpu.models.esrgan import ESRGANConfig, RRDBNet

        cfg = ESRGANConfig.tiny()
        model = RRDBNet(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        x = np.random.default_rng(0).random((1, 8, 8, 3)).astype(np.float32)
        y = np.asarray(model.apply(params, jnp.asarray(x)))

        fix = str(tmp_path / "esrgan.npz")
        np.savez(fix, input_x=x, expected_y=y)

        def apply_fn(x):
            return {"y": model.apply(params, jnp.asarray(x))}

        conversion.check_activation_fixture("esrgan", fix, apply_fn,
                                            atol=1e-5)

        # corrupted expectation must FAIL (the harness is falsifiable)
        np.savez(fix, input_x=x, expected_y=y + 0.5)
        with pytest.raises(AssertionError):
            conversion.check_activation_fixture("esrgan", fix, apply_fn,
                                                atol=1e-5)


def test_record_activations_cli(tmp_path):
    """scripts/record_activations.py --from-ours --verify round-trips."""
    import runpy
    import sys

    out = str(tmp_path / "fx.npz")
    argv0 = sys.argv
    try:
        sys.argv = ["record_activations.py", "esrgan", out, "--from-ours",
                    "--verify"]
        runpy.run_path("scripts/record_activations.py", run_name="__main__")
    finally:
        sys.argv = argv0
    data = np.load(out)
    assert "input_x" in data.files and "expected_y" in data.files


FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures",
                           "activations")
_COMMITTED = sorted(
    os.path.splitext(f)[0] for f in os.listdir(FIXTURE_DIR)
    if f.endswith(".npz")) if os.path.isdir(FIXTURE_DIR) else []


@pytest.mark.parametrize("family", _COMMITTED)
def test_committed_activation_fixtures(family):
    """Every committed tests/fixtures/activations/<family>.npz reproduces:
    pins today's numerics (PRNGKey(0) tiny config) against architecture or
    kernel drift. Re-record deliberately with
    scripts/record_activations.py <family> ... --from-ours after an
    INTENTIONAL numerics change."""
    import runpy
    import sys as _sys

    mod = runpy.run_path("scripts/record_activations.py")
    apply_fn, _ = mod["_build_ours"](family, None)
    conversion.check_activation_fixture(
        family, os.path.join(FIXTURE_DIR, f"{family}.npz"), apply_fn,
        atol=2e-4)


def test_fixture_coverage_spans_mappable_families():
    """Every exact/provisional family ships a committed fixture."""
    mappable = {name for name, fam in conversion.FAMILIES.items()
                if fam.status in ("exact", "provisional")}
    missing = mappable - set(_COMMITTED)
    assert not missing, f"families without committed fixtures: {missing}"

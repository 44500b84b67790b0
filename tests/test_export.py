"""Serving-artifact export: jax.export round trips per family.

The artifact must be self-contained (weights baked in), accept a symbolic
batch dimension, and reproduce the live sampler's outputs exactly — all
through ``deserialize(...).call`` with no mcgm_tpu code in the loop.
"""

import numpy as np
import jax
import jax.numpy as jnp

from conftest import make_tiny_cfg
from mcgm_tpu.io.export import (export_sampler, load_artifact,
                                load_serving_fn, save_artifact)
from mcgm_tpu.models import build_model
from mcgm_tpu.train.state import jit_init
from mcgm_tpu.workflows.sampling import Sampler

K = jax.random.PRNGKey(0)


def _sampler(model_name, **extra):
    cfg = make_tiny_cfg(model_name)
    cfg["classes_size"] = 10
    model = build_model(cfg)
    img = (jnp.zeros((2, 8, 8), jnp.int32) if model_name.endswith("pixelcnn")
           else jnp.zeros((2, *cfg["data_shape"])))
    batch = {"img": img, "label": jnp.zeros((2,), jnp.int32)}
    rngs = {"params": K, "z": K, "reparam": K, "noise": K}
    v = jit_init(model, rngs, batch, train=False)
    return Sampler(cfg, model, v, **extra)


def test_export_gan_symbolic_batch_roundtrip():
    s = _sampler("mcgan")
    blob = export_sampler(s, batch="b")
    fn = load_serving_fn(blob)
    for B in (3, 5):  # one artifact, multiple batch sizes
        C = jnp.arange(B, dtype=jnp.int32) % 10
        z = jax.random.normal(jax.random.PRNGKey(B), (B, s.model.latent_size))
        got = np.asarray(fn(C, z))
        want = np.asarray(s.model.apply(s.variables, C, z, method="generate"))
        assert got.shape == want.shape == (B, 32, 32, 3)
        assert np.allclose(got, want, atol=1e-5)


def test_export_vae_and_file_roundtrip(tmp_path):
    s = _sampler("mcvae")
    blob = export_sampler(s, batch="b")
    path = str(tmp_path / "m.stablehlo")
    save_artifact(blob, path)
    fn = load_artifact(path)
    C = jnp.arange(4, dtype=jnp.int32) % 10
    z = jax.random.normal(K, (4, s.model.latent_size))
    got = np.asarray(fn(C, z))
    want = np.asarray(s.model.apply(s.variables, C, z, method="generate"))
    assert np.allclose(got, want, atol=1e-5)


def test_export_glow_z_cascade():
    s = _sampler("mcglow")
    blob = export_sampler(s, batch="b")
    fn = load_serving_fn(blob)
    B = 3
    C = jnp.arange(B, dtype=jnp.int32) % 10
    z = [jax.random.normal(k, (B, *sh)) for k, sh in
         zip(jax.random.split(K, len(s.model.make_z_shapes())),
             s.model.make_z_shapes())]
    got = np.asarray(fn(C, z))
    want = np.asarray(s.model.apply(s.variables, C, z, method="generate"))
    assert np.allclose(got, want, atol=1e-4)


def test_export_pixelcnn_full_autoregressive():
    """The artifact bakes the incremental AR sampler + frozen-AE decode."""
    ae = _sampler("vqvae")
    s = _sampler("mcpixelcnn")
    s.ae_model, s.ae_variables = ae.model, ae.variables
    s.cfg["data_shape"] = (32, 32, 3)
    blob = export_sampler(s, batch="b")
    fn = load_serving_fn(blob)
    B = 2
    C = jnp.arange(B, dtype=jnp.int32) % 10
    rng = jax.random.PRNGKey(7)
    got = np.asarray(fn(C, rng))
    from mcgm_tpu.models.pixelcnn import sample_codes_incremental

    codes = sample_codes_incremental(s.model, s.variables, C, rng, (8, 8))
    want = np.asarray(ae.model.apply(ae.variables, codes,
                                     method="decode_code"))
    assert np.allclose(got, want, atol=1e-5)


def test_export_multi_platform():
    """One artifact lowered for BOTH cpu and tpu (serving hosts pick their
    lowering at load time; verified bit-identical on the real chip —
    docs/DESIGN.md). Here: lowers cross-platform and runs on cpu."""
    s = _sampler("mcgan")
    blob = export_sampler(s, batch="b", platforms=("cpu", "tpu"))
    fn = load_serving_fn(blob)
    C = jnp.arange(2, dtype=jnp.int32)
    z = jax.random.normal(K, (2, s.model.latent_size))
    got = np.asarray(fn(C, z))
    want = np.asarray(s.model.apply(s.variables, C, z, method="generate"))
    assert np.allclose(got, want, atol=1e-5)


def test_export_cli_flags_parse(tmp_path):
    """--platforms/--batch are export-only flags peeled off before parse_cfg
    (code-review finding: parse_cfg rejected the documented invocation)."""
    import pytest

    from mcgm_tpu.cli.export import main

    with pytest.raises(FileNotFoundError, match="best checkpoint"):
        main(["--data_name", "Synthetic", "--model_name", "mcvae",
              "--platforms", "cpu", "--batch", "4",
              "--output_dir", str(tmp_path)])


def test_export_int8_quantized_gan():
    """int8 PTQ artifact: runs, stays close to the f32 path (two symmetric
    roundings per conv — outputs are tanh-bounded in [-1,1]), and exactly
    reproduces the LIVE int8-traced apply (the artifact must capture the
    same quantized graph)."""
    from mcgm_tpu.ops.layers import int8_serving

    s = _sampler("mcgan")
    blob = export_sampler(s, batch="b", quantize="int8")
    fn = load_serving_fn(blob)
    B = 4
    C = jnp.arange(B, dtype=jnp.int32) % 10
    z = jax.random.normal(jax.random.PRNGKey(3), (B, s.model.latent_size))
    got = np.asarray(fn(C, z))
    want_f32 = np.asarray(s.model.apply(s.variables, C, z, method="generate"))
    assert got.shape == want_f32.shape
    assert np.isfinite(got).all()
    # quantization noise is bounded; untrained tiny nets give the loosest
    # case and still track the f32 path closely on [-1,1] outputs
    assert np.mean(np.abs(got - want_f32)) < 0.1, \
        np.mean(np.abs(got - want_f32))
    with int8_serving():
        want_q = np.asarray(
            s.model.apply(s.variables, C, z, method="generate"))
    np.testing.assert_allclose(got, want_q, atol=1e-6)


def test_export_int8_rejects_glow():
    import pytest

    s = _sampler("mcglow")
    with pytest.raises(ValueError, match="int8 serving"):
        export_sampler(s, quantize="int8")


def test_int8_flag_restored_after_export():
    from mcgm_tpu.ops.layers import _INT8_SERVING

    s = _sampler("mcvae")
    export_sampler(s, batch=2, quantize="int8")
    assert not _INT8_SERVING[0]


def test_export_created_modes_artifact():
    """Mode surgery composes with serving: create() re-randomizes modes
    (here 10 -> 7 never-trained modes), and the created model exports to a
    self-contained artifact reproducing the live created sampler."""
    from mcgm_tpu.workflows.create import _created_sampler

    s = _sampler("mcgan")
    s2 = _created_sampler(s, 7, 3)
    assert s2.cfg["classes_size"] == 7
    blob = export_sampler(s2, batch="b")
    fn = load_serving_fn(blob)
    C = jnp.arange(7, dtype=jnp.int32)
    z = jax.random.normal(K, (7, s2.model.latent_size))
    got = np.asarray(fn(C, z))
    want = np.asarray(s2.model.apply(s2.variables, C, z, method="generate"))
    assert got.shape[0] == 7
    assert np.allclose(got, want, atol=1e-5)


def test_export_int8_batch_invariant():
    """Activation scales are per-EXAMPLE, so a request's quantization does
    not depend on what it was co-batched with (code-review finding:
    per-tensor scales let a co-batched outlier rescale everyone). Exact
    bit-equality across batch sizes is unattainable even in f32 (XLA
    reassociates reduces per batch shape, ~1 ulp), which quantization can
    amplify by one level at rounding boundaries — so assert closeness at
    well-below-one-quantization-step mean error against a 100x outlier
    co-batch that would wreck a shared per-tensor scale."""
    s = _sampler("mcgan")
    fn = load_serving_fn(export_sampler(s, batch="b", quantize="int8"))
    C1 = jnp.asarray([3], jnp.int32)
    z1 = jax.random.normal(jax.random.PRNGKey(9), (1, s.model.latent_size))
    alone = np.asarray(fn(C1, z1))
    C4 = jnp.asarray([3, 0, 7, 1], jnp.int32)
    z4 = jnp.concatenate(
        [z1, 100.0 * jax.random.normal(jax.random.PRNGKey(10),
                                       (3, s.model.latent_size))])
    cobatched = np.asarray(fn(C4, z4))[:1]
    # outputs live in [-1, 1]; one int8 level of the final conv is ~1/127
    err = np.abs(alone - cobatched)
    assert err.mean() < 2e-3, err.mean()
    assert err.max() < 0.05, err.max()


def test_export_int8_static_calibrated():
    """int8_static: calibrated per-layer activation scales baked into the
    artifact. The artifact must (a) track f32 closely, (b) be EXACTLY
    batch-composition invariant (no cross-batch reduces remain in the
    quantized graph), (c) reproduce the live static-mode
    apply, and (d) refuse to export without calibration."""
    import pytest

    from mcgm_tpu.io.export import calibrate_int8
    from mcgm_tpu.ops.layers import int8_serving

    s = _sampler("mcgan")
    with pytest.raises(ValueError, match="calibrate_int8"):
        export_sampler(s, batch="b", quantize="int8_static")

    s2 = calibrate_int8(s, jax.random.PRNGKey(5), n_batches=2,
                        batch_size=16)
    assert "quant_stats" in s2.variables
    blob = export_sampler(s2, batch="b", quantize="int8_static")
    fn = load_serving_fn(blob)
    B = 4
    C = jnp.arange(B, dtype=jnp.int32) % 10
    z = jax.random.normal(jax.random.PRNGKey(6), (B, s.model.latent_size))
    got = np.asarray(fn(C, z))
    want_f32 = np.asarray(s.model.apply(s.variables, C, z, method="generate"))
    assert np.isfinite(got).all()
    assert np.mean(np.abs(got - want_f32)) < 0.1, \
        np.mean(np.abs(got - want_f32))
    with int8_serving("static"):
        want_q = np.asarray(
            s2.model.apply(s2.variables, C, z, method="generate"))
    np.testing.assert_allclose(got, want_q, atol=1e-6)
    # batch invariance: scales are baked constants, so nothing cross-batch
    # remains in the quantized graph; the residual 1e-7-scale noise is the
    # backend's per-shape conv lowering (CPU int8 convs route through float
    # paths at tiny shapes), not data dependence — a shared per-tensor scale
    # would be off by ~1e-1 here
    alone = np.asarray(fn(C[:1], z[:1]))
    np.testing.assert_allclose(alone, got[:1], atol=1e-6)

"""Scan-over-flows Glow: numerics parity with the unrolled path.

``scan_flows=True`` compiles one flow body over K-stacked parameters instead
of K flow instances — identical math, ~K-fold smaller traces. These tests pin
the properties that must survive the lifting: invertibility, DDI through the
scan, NaN-free sampling, and codebook surgery on the stacked leaves.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcgm_tpu.models.glow import MCGlow
from mcgm_tpu.models.manipulate import create, transit

K = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def scan_model():
    m = MCGlow((16, 16, 3), hidden_size=16, K=3, L=2, num_mode=6,
               controller_rate=0.5, scan_flows=True)
    img = jax.random.uniform(K, (2, 16, 16, 3), minval=-1, maxval=1)
    lbl = jnp.array([0, 4])
    v = m.init({"params": K, "noise": K}, {"img": img, "label": lbl}, train=True)
    return m, v, img, lbl


def test_stacked_param_shapes(scan_model):
    m, v, *_ = scan_model
    loc = v["params"]["block_0"]["flows"]["flow"]["actnorm"]["loc"]
    assert loc.shape[0] == 3  # leading K axis
    cb = jax.tree_util.tree_leaves(v["codebook"])[0]
    assert cb.ndim == 3 and cb.shape[1] == 6


def test_forward_reverse_roundtrip(scan_model):
    """reverse(z-list, reconstruct=True) must reproduce the dequantized x."""
    m, v, img, lbl = scan_model
    noise_rng = jax.random.PRNGKey(3)
    out = m.apply(v, {"img": img, "label": lbl}, train=False,
                  rngs={"noise": noise_rng})
    recon = m.apply(v, out["z"], lbl, True, method="reverse")
    # forward input was img*0.5 + U/256 (flax folds the noise stream, so we
    # can't regenerate the exact U); reconstruction must match within the
    # dequantization-noise bound plus the [-0.5, 0.5] clamp
    x_in = img * 0.5
    assert np.isfinite(np.asarray(recon)).all()
    assert np.abs(np.asarray(recon) / 2 - np.asarray(x_in)).max() < 0.05


def test_ddi_standardizes_through_scan(scan_model):
    m, v, img, lbl = scan_model
    out0 = m.apply(v, {"img": img, "label": lbl}, train=False,
                   rngs={"noise": K})
    _, mut = m.apply(v, {"img": img, "label": lbl}, train=True, ddi=True,
                     rngs={"noise": K}, mutable=["params"])
    v2 = {**v, "params": mut["params"]}
    out1 = m.apply(v2, {"img": img, "label": lbl}, train=False,
                   rngs={"noise": K})
    assert float(out1["loss"]) < float(out0["loss"])


def test_generate_finite(scan_model):
    m, v, _, lbl = scan_model
    gen = m.apply(v, lbl, method="generate", rngs={"z": K})
    assert gen.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(gen)).all()


def test_create_and_transit_on_stacked_codebooks(scan_model):
    m, v, *_ = scan_model
    v2 = create(v, classes_size=9)
    cb = jax.tree_util.tree_leaves(v2["codebook"])[0]
    assert cb.shape[1] == 9
    # every stacked slice has unique rows
    arr = np.asarray(cb)
    for k in range(arr.shape[0]):
        assert len({r.tobytes() for r in arr[k].astype(np.uint8)}) == 9
    v3 = transit(v, root=0, alpha=0.0)
    cb3 = np.asarray(jax.tree_util.tree_leaves(v3["codebook"])[0])
    for k in range(cb3.shape[0]):
        assert np.allclose(cb3[k], cb3[k][0:1])


def test_scan_vs_unrolled_same_loss_with_copied_params(scan_model):
    """Copy stacked params into an unrolled model — losses must match exactly."""
    m_scan, v_scan, img, lbl = scan_model
    m_unroll = MCGlow((16, 16, 3), hidden_size=16, K=3, L=2, num_mode=6,
                      controller_rate=0.5, scan_flows=False)
    v_unroll = m_unroll.init({"params": K, "noise": K},
                             {"img": img, "label": lbl}, train=True)

    def unstack(coll):
        out = {}
        for bname, block in coll.items():
            if not isinstance(block, dict) or "flows" not in block:
                out[bname] = block
                continue
            nb = {k: vv for k, vv in block.items() if k != "flows"}
            stacked = block["flows"]["flow"]
            for i in range(3):
                nb[f"flow_{i}"] = jax.tree_util.tree_map(lambda a: a[i], stacked)
            out[bname] = nb
        return out

    v_copied = {coll: unstack(tree) for coll, tree in v_scan.items()}
    # sanity: structures match the unrolled model
    s1 = jax.tree_util.tree_structure(v_copied["params"])
    s2 = jax.tree_util.tree_structure(v_unroll["params"])
    assert s1 == s2
    rngs = {"noise": jax.random.PRNGKey(7)}
    l_scan = m_scan.apply(v_scan, {"img": img, "label": lbl}, train=False,
                          rngs=rngs)["loss"]
    l_unroll = m_unroll.apply(v_copied, {"img": img, "label": lbl},
                              train=False, rngs=rngs)["loss"]
    assert abs(float(l_scan) - float(l_unroll)) < 1e-4


def test_scan_chunk_matches_chunk1():
    """scan_chunk=2 (two flows per scan body, K/2 steps) must be the same
    math as scan_chunk=1 once the stacked leaves are repacked."""
    from mcgm_tpu.models.glow import rechunk_glow_flows

    m1 = MCGlow((16, 16, 3), hidden_size=16, K=4, L=2, num_mode=6,
                controller_rate=0.5, scan_flows=True, scan_chunk=1)
    img = jax.random.uniform(K, (2, 16, 16, 3), minval=-1, maxval=1)
    lbl = jnp.array([1, 5])
    batch = {"img": img, "label": lbl}
    v1 = m1.init({"params": K, "noise": K}, batch, train=True)

    m2 = MCGlow((16, 16, 3), hidden_size=16, K=4, L=2, num_mode=6,
                controller_rate=0.5, scan_flows=True, scan_chunk=2)
    v2 = rechunk_glow_flows(v1, to_chunk=2)
    # structure matches a natively-initialized chunk=2 model
    v2_native = m2.init({"params": K, "noise": K}, batch, train=True)
    assert (jax.tree_util.tree_structure(v2["params"])
            == jax.tree_util.tree_structure(v2_native["params"]))

    rngs = {"noise": jax.random.PRNGKey(7)}
    o1 = m1.apply(v1, batch, train=False, rngs=rngs)
    o2 = m2.apply(v2, batch, train=False, rngs=rngs)
    assert abs(float(o1["loss"]) - float(o2["loss"])) < 1e-5
    g1 = m1.apply(v1, lbl, method="generate", rngs={"z": K})
    g2 = m2.apply(v2, lbl, method="generate", rngs={"z": K})
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)
    # gradients agree too (the chunk body is remat'd in backward)
    def loss1(p):
        return m1.apply({**v1, "params": p}, batch, train=True, rngs=rngs)["loss"]

    def loss2(p):
        return m2.apply({**v2, "params": p}, batch, train=True, rngs=rngs)["loss"]

    g1 = jax.grad(loss1)(v1["params"])
    g2 = jax.grad(loss2)(v2["params"])
    g2_flat = rechunk_glow_flows(g2, to_chunk=1, from_chunk=2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-5),
        g1, g2_flat)


def test_checkpoint_scan_chunk_layout_migration():
    """Resuming a glow run with a DIFFERENT scan_chunk than it was trained
    with must repack the scanned leaves transparently (the load path calls
    _match_glow_scan_layout; a layout mismatch otherwise crashes resume)."""
    from types import SimpleNamespace

    from mcgm_tpu.train.loop import Experiment

    m1 = MCGlow((16, 16, 3), hidden_size=16, K=4, L=2, num_mode=6,
                controller_rate=0.5, scan_flows=True, scan_chunk=1)
    img = jax.random.uniform(K, (2, 16, 16, 3), minval=-1, maxval=1)
    lbl = jnp.array([2, 3])
    batch = {"img": img, "label": lbl}
    v1 = m1.init({"params": K, "noise": K}, batch, train=True)

    def match(chunk, variables):
        stub = SimpleNamespace(cfg={"glow": {"scan_flows": True,
                                             "scan_chunk": chunk}})
        return Experiment._match_glow_scan_layout(stub, variables)

    # chunk=1 checkpoint loaded into a chunk=2 config: repacked, same math
    v2 = match(2, v1)
    m2 = MCGlow((16, 16, 3), hidden_size=16, K=4, L=2, num_mode=6,
                controller_rate=0.5, scan_flows=True, scan_chunk=2)
    rngs = {"noise": jax.random.PRNGKey(11)}
    l1 = m1.apply(v1, batch, train=False, rngs=rngs)["loss"]
    l2 = m2.apply(v2, batch, train=False, rngs=rngs)["loss"]
    assert abs(float(l1) - float(l2)) < 1e-5
    # and back: chunk=2 checkpoint into a chunk=1 config
    v1b = match(1, v2)
    l1b = m1.apply(v1b, batch, train=False, rngs=rngs)["loss"]
    assert abs(float(l1) - float(l1b)) < 1e-6
    # matching layouts are returned untouched (no repack, same object)
    assert match(1, v1) is v1


def test_create_torch_compat_chunk_layout_equal():
    """create(torch_compat=True) assigns the reference's flow-major draws
    identically under every scan_chunk packing — the chunked layout
    interleaves flows across flow_j leaves, so a naive per-leaf walk would
    hand the torch-stream draws to the wrong flows."""
    pytest.importorskip("torch")
    from mcgm_tpu.models.glow import rechunk_glow_flows

    m = MCGlow((16, 16, 3), hidden_size=16, K=4, L=2, num_mode=6,
               controller_rate=0.5, scan_flows=True)
    img = jax.random.uniform(K, (2, 16, 16, 3), minval=-1, maxval=1)
    lbl = jnp.array([0, 4])
    v = m.init({"params": K, "noise": K}, {"img": img, "label": lbl},
               train=True)
    v2 = rechunk_glow_flows(v, to_chunk=2, from_chunk=1)
    a = create(v, 5, rng_seed=7, torch_compat=True, model_name="mcglow")
    b = create(v2, 5, rng_seed=7, torch_compat=True, model_name="mcglow")
    b_flat = rechunk_glow_flows(b, to_chunk=1, from_chunk=2)
    la = {jax.tree_util.keystr(p): x for p, x
          in jax.tree_util.tree_leaves_with_path(a["codebook"])}
    lb = {jax.tree_util.keystr(p): x for p, x
          in jax.tree_util.tree_leaves_with_path(b_flat["codebook"])}
    assert la.keys() == lb.keys() and la
    for k in la:
        np.testing.assert_array_equal(np.asarray(la[k]), np.asarray(lb[k]),
                                      err_msg=k)

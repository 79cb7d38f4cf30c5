"""End-to-end logits parity: JAX CvT vs the independent Keras twin of the
reference architecture, with shared weights — the BASELINE.json <= 1e-3
requirement (outputs typically agree to ~1e-5 in float32).

Covers the reference's whole config axis: projection in {dw_bn, avg, linear}
x cls token on/off (models/CvT(Par).py:25-28) and the image-only variant
(models/CvT(Img).py).
"""

import numpy as np
import pytest

import jax

from transformer_stm_tpu.config import CvTSpec
from transformer_stm_tpu.models import cvt_forward, ffn_forward, init_ffn

tf = pytest.importorskip("tensorflow")

from transformer_stm_tpu.train.keras_compat import build_twin, twin_to_pytree

# Small spec = same topology, faster test (full-size spec covered in the
# flagship case below).
SMALL = CvTSpec(
    stages=(
        CvTSpec().stages[0].__class__(embed_dim=16, patch_size=7, stride=4,
                                      num_heads=1),
        CvTSpec().stages[1].__class__(embed_dim=24, patch_size=3, stride=2,
                                      num_heads=2),
        CvTSpec().stages[2].__class__(embed_dim=32, patch_size=3, stride=2,
                                      num_heads=4, with_cls_token=True),
    ),
    image_height=64, image_width=64,
)


def _compare(spec, seed=0, atol=2e-4):
    twin = build_twin(spec, batch=2, seed=seed)
    params, state = twin_to_pytree(twin)
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0, 1, (2, spec.image_height, spec.image_width,
                              spec.num_channels)).astype(np.float32)
    proc = (rng.normal(size=(2, spec.proc_dim)).astype(np.float32)
            if spec.proc_dim > 0 else None)
    ref = np.asarray(twin(imgs, proc, training=False))
    got, _ = cvt_forward(params, state, spec, imgs, proc, train=False,
                         impl="xla")
    got = np.asarray(got)
    assert ref.shape == got.shape
    np.testing.assert_allclose(got, ref, atol=atol, rtol=0)
    # the hard 1e-3 gate from BASELINE.json
    assert np.max(np.abs(got - ref)) < 1e-3


@pytest.mark.parametrize("method", ["dw_bn", "avg", "linear"])
@pytest.mark.parametrize("cls", [True, False])
def test_cvt_parity_projections(method, cls):
    spec = SMALL.with_projection(method, cls)
    _compare(spec, seed=hash((method, cls)) % 1000)


def test_cvt_parity_image_only():
    import dataclasses
    spec = dataclasses.replace(SMALL, proc_dim=0)
    _compare(spec, seed=42)


def test_cvt_parity_flagship_fullsize():
    """The exact reference flagship config: 128px, dims 64/128/256,
    dw_bn + cls (models/CvT(Par).py:66-72)."""
    _compare(CvTSpec(), seed=7)


def test_ffn_parity():
    """FFN(OnlyPar) (reference: models/FFN(OnlyPar).py:55-67)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 5)).astype(np.float32)
    l1 = tf.keras.layers.Dense(256, activation="relu")
    l2 = tf.keras.layers.Dense(256, activation="relu")
    l3 = tf.keras.layers.Dense(1)
    ref = l3(l2(l1(x))).numpy()
    import jax.numpy as jnp
    params = {
        "fc1": {"kernel": jnp.asarray(l1.kernel.numpy()),
                "bias": jnp.asarray(l1.bias.numpy())},
        "fc2": {"kernel": jnp.asarray(l2.kernel.numpy()),
                "bias": jnp.asarray(l2.bias.numpy())},
        "final": {"kernel": jnp.asarray(l3.kernel.numpy()),
                  "bias": jnp.asarray(l3.bias.numpy())},
    }
    got = np.asarray(ffn_forward(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=0)


def test_twin_param_count_matches_jax_model():
    """Same number of trainable scalars on both sides of the mapping."""
    from transformer_stm_tpu.models import init_cvt

    spec = SMALL
    twin = build_twin(spec, batch=1)
    params, state = twin_to_pytree(twin)
    jparams, jstate = init_cvt(jax.random.PRNGKey(0), spec)
    n_twin = sum(x.size for x in jax.tree_util.tree_leaves(params))
    n_jax = sum(x.size for x in jax.tree_util.tree_leaves(jparams))
    assert n_twin == n_jax
    # pytree structures are identical
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(jparams))
    assert (jax.tree_util.tree_structure(state)
            == jax.tree_util.tree_structure(jstate))

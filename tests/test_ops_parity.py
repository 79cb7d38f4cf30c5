"""Piecewise numerics parity: each op vs the Keras layer it replaces.

The reference outsources these to Keras (models/CvT(Par).py:93-142,203-259);
any deviation here would break the end-to-end logits-parity requirement
(BASELINE.json: <= 1e-3), so each op is pinned at ~1e-5 against TF on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_stm_tpu.ops import (
    avg_pool_same, batch_norm, conv2d, dense, depthwise_conv2d, gelu,
    init_batch_norm, layer_norm, mha, same_padding,
)

tf = pytest.importorskip("tensorflow")

TOL = 1e-4  # float32 accumulation-order noise; the product contract is 1e-3


def test_same_padding_matches_tf():
    # stride-4 7x7 on 128 (stage-1 embed) and stride-2 3x3 on 32
    for in_size, k, s in [(128, 7, 4), (32, 3, 2), (16, 3, 2), (32, 3, 1),
                          (127, 7, 4), (33, 4, 2)]:
        x = np.random.default_rng(0).normal(
            size=(1, in_size, in_size, 2)).astype(np.float32)
        kernel = np.random.default_rng(1).normal(
            size=(k, k, 2, 3)).astype(np.float32)
        ref = tf.nn.conv2d(x, kernel, strides=s, padding="SAME").numpy()
        got = conv2d({"kernel": jnp.asarray(kernel)}, jnp.asarray(x),
                     stride=s)
        np.testing.assert_allclose(np.asarray(got), ref, atol=TOL, rtol=0)


def test_conv2d_with_bias():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    layer = tf.keras.layers.Conv2D(8, 3, strides=2, padding="same")
    ref = layer(x).numpy()
    params = {"kernel": jnp.asarray(layer.kernel.numpy()),
              "bias": jnp.asarray(layer.bias.numpy())}
    got = conv2d(params, jnp.asarray(x), stride=2)
    np.testing.assert_allclose(np.asarray(got), ref, atol=TOL, rtol=0)


def test_depthwise_conv2d():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 12, 12, 6)).astype(np.float32)
    layer = tf.keras.layers.DepthwiseConv2D(3, strides=1, padding="same",
                                            use_bias=False)
    ref = layer(x).numpy()
    kernel = layer.weights[0].numpy()  # (3, 3, 6, 1)
    got = depthwise_conv2d({"kernel": jnp.asarray(kernel)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=TOL, rtol=0)


def test_batch_norm_inference():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    layer = tf.keras.layers.BatchNormalization()
    layer(x, training=False)  # build
    layer.gamma.assign(rng.normal(1, 0.2, (5,)).astype(np.float32))
    layer.beta.assign(rng.normal(0, 0.2, (5,)).astype(np.float32))
    layer.moving_mean.assign(rng.normal(0, 1, (5,)).astype(np.float32))
    layer.moving_variance.assign(rng.uniform(0.5, 2, (5,))
                                 .astype(np.float32))
    ref = layer(x, training=False).numpy()
    params = {"gamma": jnp.asarray(layer.gamma.numpy()),
              "beta": jnp.asarray(layer.beta.numpy())}
    state = {"mean": jnp.asarray(layer.moving_mean.numpy()),
             "var": jnp.asarray(layer.moving_variance.numpy())}
    got, _ = batch_norm(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=TOL, rtol=0)


def test_batch_norm_training_updates_stats():
    rng = np.random.default_rng(5)
    x = rng.normal(2.0, 3.0, size=(4, 8, 8, 5)).astype(np.float32)
    layer = tf.keras.layers.BatchNormalization()
    ref = layer(x, training=True).numpy()
    params, state = init_batch_norm(5)
    got, new_state = batch_norm(params, state, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               layer.moving_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               layer.moving_variance.numpy(), atol=1e-4)


def test_avg_pool_same_excludes_padding():
    rng = np.random.default_rng(6)
    for size, k, s in [(8, 3, 1), (9, 3, 2), (8, 2, 2)]:
        x = rng.normal(size=(2, size, size, 3)).astype(np.float32)
        layer = tf.keras.layers.AveragePooling2D(pool_size=k, strides=s,
                                                 padding="same")
        ref = layer(x).numpy()
        got = avg_pool_same(jnp.asarray(x), k, s)
        np.testing.assert_allclose(np.asarray(got), ref, atol=TOL, rtol=0)


def test_layer_norm():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 10, 16)).astype(np.float32)
    layer = tf.keras.layers.LayerNormalization(epsilon=1e-6)
    layer(x)
    layer.gamma.assign(rng.normal(1, 0.2, (16,)).astype(np.float32))
    layer.beta.assign(rng.normal(0, 0.2, (16,)).astype(np.float32))
    ref = layer(x).numpy()
    params = {"gamma": jnp.asarray(layer.gamma.numpy()),
              "beta": jnp.asarray(layer.beta.numpy())}
    got = layer_norm(params, jnp.asarray(x), eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), ref, atol=TOL, rtol=0)


def test_gelu_exact():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    ref = tf.nn.gelu(x, approximate=False).numpy()
    np.testing.assert_allclose(np.asarray(gelu(jnp.asarray(x))), ref,
                               atol=TOL, rtol=0)


def test_mha_matches_keras():
    """Keras MultiHeadAttention numerics incl. the (query, value, key)
    argument order the reference uses (models/CvT(Par).py:185)."""
    rng = np.random.default_rng(8)
    dim, heads, t = 32, 4, 10
    q = rng.normal(size=(2, t, dim)).astype(np.float32)
    k = rng.normal(size=(2, t, dim)).astype(np.float32)
    v = rng.normal(size=(2, t, dim)).astype(np.float32)
    layer = tf.keras.layers.MultiHeadAttention(num_heads=heads,
                                               key_dim=dim // heads)
    ref = layer(q, v, k, training=False).numpy()  # (query, value, key)
    params = {
        "query": {"kernel": jnp.asarray(layer._query_dense.kernel.numpy()),
                  "bias": jnp.asarray(layer._query_dense.bias.numpy())},
        "key": {"kernel": jnp.asarray(layer._key_dense.kernel.numpy()),
                "bias": jnp.asarray(layer._key_dense.bias.numpy())},
        "value": {"kernel": jnp.asarray(layer._value_dense.kernel.numpy()),
                  "bias": jnp.asarray(layer._value_dense.bias.numpy())},
        "out": {"kernel": jnp.asarray(layer._output_dense.kernel.numpy()),
                "bias": jnp.asarray(layer._output_dense.bias.numpy())},
    }
    got = mha(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
              impl="xla")
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=0)


def test_dense_matches_keras():
    rng = np.random.default_rng(9)
    x = rng.normal(size=(3, 7)).astype(np.float32)
    layer = tf.keras.layers.Dense(11)
    ref = layer(x).numpy()
    params = {"kernel": jnp.asarray(layer.kernel.numpy()),
              "bias": jnp.asarray(layer.bias.numpy())}
    np.testing.assert_allclose(np.asarray(dense(params, jnp.asarray(x))),
                               ref, atol=TOL, rtol=0)

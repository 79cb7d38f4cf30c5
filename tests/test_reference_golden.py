"""Fast reference-parity check against cached goldens (no TensorFlow).

tests/goldens/ref_parity_*.npz hold, per model variant, the parameters
imported from a GENUINE reference `save_weights` h5 (built by
scripts/make_parity_goldens.py from /root/reference's actual Keras code at
reduced width), the input batch, and the reference model's logits.  This
test replays cvt_forward on them in seconds — the regression surface for
our model numerics in the default dev loop.  The full TF round-trip
(build + save_weights + h5 import) stays covered by the slow
tests/test_reference_parity.py.
"""

import dataclasses
import glob
import os

import numpy as np
import pytest

import jax

GOLDENS = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "goldens", "ref_parity_*.npz")))

pytestmark = pytest.mark.skipif(
    not GOLDENS, reason="no goldens committed — run "
    "scripts/make_parity_goldens.py")


def _rebuild(npz, spec):
    """Path-keyed arrays -> params/state pytrees with the init structure."""
    from transformer_stm_tpu.models.cvt import init_cvt

    params0, state0 = init_cvt(jax.random.PRNGKey(0), spec)

    def fill(tree, tag):
        leaves = jax.tree_util.tree_leaves_with_path(tree)
        out = []
        for path, leaf in leaves:
            key = tag + jax.tree_util.keystr(path)
            assert key in npz, f"golden missing {key}"
            arr = npz[key]
            assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
            out.append(arr)
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(tree), out)

    return fill(params0, "p"), fill(state0, "s")


@pytest.mark.parametrize("path", GOLDENS,
                         ids=[os.path.basename(p) for p in GOLDENS])
def test_forward_matches_reference_golden(path):
    from transformer_stm_tpu.config import CvTSpec
    from transformer_stm_tpu.models.cvt import cvt_forward

    npz = np.load(path)
    name = os.path.basename(path)          # ref_parity_{method}_cls{b}.npz
    method = name[len("ref_parity_"):name.index("_cls")]
    cls = name[name.index("_cls") + 4:-4] == "True"

    base = CvTSpec().with_projection(method, cls)
    dims, heads = npz["dims"], npz["heads"]
    spec = dataclasses.replace(base, stages=tuple(
        dataclasses.replace(st, embed_dim=int(dims[i]),
                            num_heads=int(heads[i]))
        for i, st in enumerate(base.stages)))

    params, state = _rebuild(npz, spec)
    out, _ = cvt_forward(params, state, spec, npz["images"], npz["proc"],
                         train=False)
    got = np.asarray(out).ravel()
    np.testing.assert_allclose(got, npz["ref_out"], atol=1e-3)

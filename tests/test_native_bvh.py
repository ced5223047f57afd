"""Native C++ BVH builder vs the numpy reference implementation."""

import numpy as np

from zyg_tpu.native import build_bvh_native
from zyg_tpu.scene.bvh import _build_bvh_numpy


def random_prims(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    h = rng.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
    return c - h, c + h


def _leaf_prims(bvh):
    """Set of frozensets of prim ids per leaf — layout-independent check."""
    out = []
    for i in range(len(bvh.first_prim)):
        if bvh.first_prim[i] >= 0:
            lo = bvh.first_prim[i]
            out.append(frozenset(bvh.prim_order[lo : lo + bvh.prim_count[i]].tolist()))
    return out


class TestNativeBvh:
    def test_native_available(self):
        pmin, pmax = random_prims(32)
        assert build_bvh_native(pmin, pmax) is not None, "g++ build failed"

    def test_matches_numpy_builder(self):
        """Same algorithm -> identical trees (links, bounds, ordering)."""
        for n, seed in ((1, 0), (4, 1), (33, 2), (500, 3)):
            pmin, pmax = random_prims(n, seed)
            a = build_bvh_native(pmin, pmax)
            b = _build_bvh_numpy(pmin, pmax)
            assert a is not None
            np.testing.assert_array_equal(a.hit_link, b.hit_link)
            np.testing.assert_array_equal(a.miss_link, b.miss_link)
            np.testing.assert_array_equal(a.first_prim, b.first_prim)
            np.testing.assert_array_equal(a.prim_count, b.prim_count)
            np.testing.assert_array_equal(a.prim_order, b.prim_order)
            np.testing.assert_allclose(a.nodes_min, b.nodes_min, atol=1e-6)
            np.testing.assert_allclose(a.nodes_max, b.nodes_max, atol=1e-6)

    def test_all_prims_in_leaves(self):
        pmin, pmax = random_prims(257, 7)
        a = build_bvh_native(pmin, pmax)
        seen = sorted(x for s in _leaf_prims(a) for x in s)
        assert seen == list(range(257))

"""Substrate tests: math, RNG, Sobol', distributions, spectrum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zyg_tpu.core import vecmath as vm
from zyg_tpu.core import sobol as sb
from zyg_tpu.core.rng import Pcg32, LaneRng, hash_u32, u32_to_float
from zyg_tpu.core.distribution import Distribution1D, Distribution2D
from zyg_tpu.core import spectrum as spec


class TestVecmath:
    def test_normalize(self):
        v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
        n = vm.normalize(v)
        np.testing.assert_allclose(vm.length(n), [1.0, 1.0], atol=1e-6)

    def test_onb_orthogonal(self, rng_np):
        n = rng_np.normal(size=(64, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        t, b = vm.orthonormal_basis(jnp.asarray(n))
        np.testing.assert_allclose(vm.dot(t, b), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.dot(t, jnp.asarray(n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(vm.dot(b, jnp.asarray(n)), 0.0, atol=1e-5)
        # right-handed: t x b = n
        np.testing.assert_allclose(np.asarray(vm.cross(t, b)), n, atol=1e-5)

    def test_quat_roundtrip(self, rng_np):
        q = rng_np.normal(size=(32, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        m = vm.quat_to_mat3(jnp.asarray(q))
        q2 = np.asarray(vm.mat3_to_quat(m))
        # q and -q are the same rotation
        sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-4)

    def test_rotation_orthonormal(self, rng_np):
        q = rng_np.normal(size=(8, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        m = np.asarray(vm.quat_to_mat3(jnp.asarray(q)))
        eye = np.einsum("bij,bkj->bik", m, m)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)

    def test_transform_roundtrip(self, rng_np):
        q = rng_np.normal(size=(4,)).astype(np.float32)
        q /= np.linalg.norm(q)
        rot = vm.quat_to_mat3(jnp.asarray(q))
        scale = jnp.array([2.0, 3.0, 0.5])
        pos = jnp.array([1.0, -2.0, 5.0])
        p = jnp.asarray(rng_np.normal(size=(16, 3)).astype(np.float32))
        w = vm.object_to_world_point(rot, scale, pos, p)
        p2 = vm.world_to_object_point(rot, scale, pos, w)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-4)

    def test_cosine_hemisphere(self, rng_np):
        uv = jnp.asarray(rng_np.random(size=(8192, 2)).astype(np.float32))
        d, pdf = vm.sample_hemisphere_cosine(uv)
        assert float(jnp.min(d[..., 2])) >= 0.0
        np.testing.assert_allclose(np.asarray(vm.length(d)), 1.0, atol=1e-3)
        # mean z of cosine-weighted samples = 2/3
        assert abs(float(jnp.mean(d[..., 2])) - 2.0 / 3.0) < 0.01


class TestRng:
    def test_pcg32_reference_values(self):
        # PCG32 XSH-RR with the canonical seed produces the published stream.
        g = Pcg32(state=42, sequence=54)
        expected = [0xA15C02B7, 0x7B47F409, 0xBA1D3330, 0x83D2F293, 0xBFA4784B, 0xCBED606E]
        got = [int(g.random_u32()[0]) for _ in range(6)]
        assert got == expected

    def test_float_range(self):
        g = Pcg32(state=np.arange(1000), sequence=np.zeros(1000))
        f = g.random_float()
        assert f.min() >= 0.0 and f.max() < 1.0

    def test_lane_rng_uniform(self):
        rng = LaneRng(jnp.arange(4096, dtype=jnp.uint32))
        xs = np.asarray(rng.next_float())
        assert xs.min() >= 0.0 and xs.max() < 1.0
        assert abs(xs.mean() - 0.5) < 0.02

    def test_hash_distinct(self):
        h = np.asarray(hash_u32(jnp.arange(1 << 16, dtype=jnp.uint32)))
        assert len(np.unique(h)) == 1 << 16


class TestSobol:
    def test_directions_match_reference_table(self):
        # Spot-check the generated Joe-Kuo table against known values of the
        # standard 5-D direction-number set (public constants).
        D = sb._generate_directions()
        assert D[0, 0] == 0x80000000 and D[0, 31] == 0x00000001
        assert D[1, 1] == 0xC0000000 and D[1, 3] == 0xF0000000
        assert D[2, 2] == 0x60000000 and D[2, 3] == 0x90000000
        assert D[3, 3] == 0x50000000 and D[3, 4] == 0xF8000000
        assert D[4, 3] == 0xB0000000 and D[4, 4] == 0xF8000000

    def test_unscrambled_sobol_first_points(self):
        pts = np.asarray(sb.sobol5(jnp.arange(4, dtype=jnp.uint32)), np.uint64)
        # index 0 -> all zeros; index 1 -> 0.5 in every dim
        assert (pts[0] == 0).all()
        assert (pts[1] == 0x80000000).all()

    def test_bit_reverse(self):
        x = jnp.asarray([0x00000001, 0x80000000, 0xDEADBEEF], dtype=jnp.uint32)
        r = np.asarray(sb.bit_reverse32(x))
        assert r[0] == 0x80000000 and r[1] == 0x00000001
        assert int(sb.bit_reverse32(jnp.uint32(r[2]))) == 0xDEADBEEF

    def test_sampler_stream_uniformity(self):
        n = 4096
        smp = sb.SobolSampler.start_pixel(
            jnp.zeros(n, jnp.uint32), jnp.arange(n, dtype=jnp.uint32)
        )
        x = np.asarray(smp.sample_1d())
        assert x.min() >= 0.0 and x.max() < 1.0
        assert abs(x.mean() - 0.5) < 0.02

    def test_sampler_stratification(self):
        # A single pixel stream over many samples should stratify much better
        # than random: 1D discrepancy of first 256 samples.
        n = 256
        smp = sb.SobolSampler.start_pixel(
            jnp.arange(n, dtype=jnp.uint32), jnp.full((n,), 7, jnp.uint32)
        )
        x = np.sort(np.asarray(smp.sample_1d()))
        star_disc = np.max(np.abs(x - (np.arange(n) + 0.5) / n))
        assert star_disc < 0.02  # random would be ~1/sqrt(n) ≈ 0.0625

    def test_dimension_bookkeeping(self):
        n = 8
        smp = sb.SobolSampler.start_pixel(jnp.zeros(n, jnp.uint32), jnp.zeros(n, jnp.uint32))
        s4 = smp.sample_4d()
        s1 = smp.sample_1d()
        assert s4.shape == (n, 4) and s1.shape == (n,)
        assert smp.dim == 5
        smp.increment_padding()
        s2 = smp.sample_2d()
        assert smp.dim == 2 and s2.shape == (n, 2)


class TestDistribution:
    def test_1d_discrete(self):
        d = Distribution1D.build(jnp.array([1.0, 2.0, 3.0, 2.0]))
        u = jnp.linspace(0.0, 0.999, 8000)
        idx, pdf = d.sample_discrete(u)
        counts = np.bincount(np.asarray(idx), minlength=4) / 8000.0
        np.testing.assert_allclose(counts, [1 / 8, 2 / 8, 3 / 8, 2 / 8], atol=0.01)
        np.testing.assert_allclose(np.asarray(d.pdf_discrete(jnp.arange(4))), [1 / 8, 2 / 8, 3 / 8, 2 / 8], atol=1e-6)

    def test_1d_continuous_integrates(self):
        w = jnp.array([0.5, 1.5, 1.0, 3.0])
        d = Distribution1D.build(w)
        u = jnp.linspace(0.0, 0.9999, 4096)
        x, pdf = d.sample_continuous(u)
        # E[f(x)/pdf(x)] estimates integral of f; take f = pdf -> estimates E[pdf]
        np.testing.assert_allclose(np.asarray(d.pdf_continuous(x)), np.asarray(pdf), rtol=1e-4)

    def test_2d_sampling(self, rng_np):
        grid = jnp.asarray(rng_np.random((16, 32)).astype(np.float32)) + 0.01
        d = Distribution2D.build(grid)
        uv = jnp.asarray(rng_np.random((8192, 2)).astype(np.float32))
        xy, pdf = d.sample_continuous(uv)
        assert float(pdf.min()) > 0.0
        np.testing.assert_allclose(np.asarray(d.pdf(xy)), np.asarray(pdf), rtol=1e-3)
        # chi2-ish check: estimator of uniform integral f=1 -> E[1/pdf] = 1
        est = float(jnp.mean(1.0 / pdf))
        assert abs(est - 1.0) < 0.05


class TestSpectrum:
    def test_srgb_roundtrip(self):
        c = jnp.linspace(0.0, 1.0, 64)
        rt = spec.srgb_to_linear(spec.linear_to_srgb(c))
        np.testing.assert_allclose(np.asarray(rt), np.asarray(c), atol=1e-5)

    def test_luminance_white(self):
        assert abs(float(spec.luminance(jnp.array([1.0, 1.0, 1.0]))) - 1.0) < 1e-5

    def test_blackbody_6500_near_white(self):
        rgb = spec.blackbody(6500.0)
        assert rgb.max() / max(rgb.min(), 1e-3) < 1.4


class TestLaneRngFloatTrick:
    def test_u32_to_float(self):
        bits = jnp.asarray([0, 0xFFFFFFFF, 0x80000000], dtype=jnp.uint32)
        f = np.asarray(u32_to_float(bits))
        assert f[0] == 0.0 and f[1] < 1.0 and abs(f[2] - 0.5) < 1e-6


class TestDistribution3D:
    """ref base/math/distribution_3d.zig + summed_area_table.zig."""

    def test_sample_histogram_matches_pdf(self):
        from zyg_tpu.core.distribution import Distribution3D

        rng = np.random.default_rng(3)
        grid = rng.uniform(0.1, 2.0, (4, 6, 8)).astype(np.float32)
        dist = Distribution3D.build(grid)
        n = 200_000
        uvw = jnp.asarray(rng.random((n, 3)), jnp.float32)
        xyz, pdf = dist.sample_continuous(uvw)
        xyz = np.asarray(xyz)
        assert ((xyz >= 0) & (xyz < 1)).all()
        # pdf consistency: sampled pdf == pdf at the sampled location
        np.testing.assert_allclose(
            np.asarray(pdf), np.asarray(dist.pdf(jnp.asarray(xyz))), rtol=1e-5
        )
        # histogram over slices matches slice masses
        k = (xyz[:, 2] * 4).astype(int)
        mass = grid.sum(axis=(1, 2)) / grid.sum()
        for s in range(4):
            assert abs((k == s).mean() - mass[s]) < 0.01
        # MC integral of 1/pdf over samples ~= 1 (unit cube volume)
        est = (1.0 / np.asarray(pdf)).mean()
        assert abs(est - 1.0) < 0.02

    def test_summed_area_table(self):
        from zyg_tpu.core.distribution import SummedAreaTable

        rng = np.random.default_rng(5)
        g = rng.uniform(0, 1, (10, 14)).astype(np.float32)
        sat = SummedAreaTable.build(g)
        np.testing.assert_allclose(float(sat.total), g.sum(), rtol=1e-5)
        for _ in range(10):
            x0, x1 = sorted(rng.integers(0, 15, 2))
            y0, y1 = sorted(rng.integers(0, 11, 2))
            want = g[y0:y1, x0:x1].sum()
            got = float(sat.integral(x0, y0, x1, y1))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestEncoding:
    """Octahedral normal + unorm/snorm packing (ref base encoding +
    vector.zig octEncode; vertex_buffer.zig stores normals compressed)."""

    def test_oct_roundtrip_accuracy(self, rng_np):
        import numpy as np
        from zyg_tpu.core import encoding as enc

        n = rng_np.standard_normal((4096, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        w = enc.oct_normal_pack(n)
        assert w.dtype == np.uint32 and w.shape == (4096,)
        back = np.asarray(enc.oct_normal_unpack(w))
        dots = np.clip(np.sum(n * back, axis=-1), -1, 1)
        err = np.arccos(dots)
        assert err.max() < 2e-3, f"max angular error {err.max()}"

    def test_oct_decode_on_device(self, rng_np):
        import jax.numpy as jnp
        import numpy as np
        from zyg_tpu.core import encoding as enc

        n = rng_np.standard_normal((256, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        w = jnp.asarray(enc.oct_normal_pack(n))
        back = np.asarray(enc.oct_normal_unpack(w))
        assert np.abs(np.linalg.norm(back, axis=-1) - 1).max() < 1e-5

    def test_unorm16(self):
        import numpy as np
        from zyg_tpu.core import encoding as enc

        x = np.linspace(0, 1, 1000, dtype=np.float32)
        q = enc.unorm16_pack(x)
        assert np.abs(np.asarray(enc.unorm16_unpack(q)) - x).max() < 1e-4

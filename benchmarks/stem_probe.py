"""Probe: space-to-depth rewrite of the stem convs (NEXT r3 perf item 3).

conv0 (k3s2 on [B,640,640,3]) and conv1 (k3s2 on [B,320,320,C]) run at
133-200 GiB/s on v5e (profile_fwd.py) — the narrow input-channel depthwise
layouts starve the MXU. The EXACT equivalent: space-to-depth the input by
2x2 blocks ([B,H,W,C] -> [B,H/2,W/2,4C]) and convolve k2s1 with a
remapped kernel.

Derivation (lax SAME for k3 s2 pads (lo,hi)=(0,1)): output (i,j) reads
rows {2i, 2i+1, 2i+2}. In S2D cells (row a, in-block da): 2i = (a=i, 0),
2i+1 = (i, 1), 2i+2 = (i+1, 0). So a k2 window over a in {i, i+1}
(explicit padding (0,1)) covers it, with kernel

    K'[0, B, (0, db, c), o] = K[0, v(B, db), c, o]       (a = i row)
    K'[0, B, (1, db, c), o] = K[1, v(B, db), c, o]
    K'[1, B, (0, db, c), o] = K[2, v(B, db), c, o]       (a = i+1 row)
    all other entries 0                                   (7/16 blocks)

and symmetrically for columns (B, db). 16*C vs 9*C MACs/output (1.78x
FLOPs) but MXU-shaped contractions instead of C_in=3 starvation.

Same-run A/B: original conv0 / conv0+conv1 chain vs S2D form, bs=128,
equivalence asserted to f32 tolerance first.
"""

from __future__ import annotations

import time

K = 10


def s2d(x):
    import jax.numpy as jnp

    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def remap_kernel(k):
    """[3,3,Cin,Cout] k3s2 kernel -> [2,2,4*Cin,Cout] k2s1-on-S2D kernel."""
    import numpy as np

    kh, kw, cin, cout = k.shape
    assert (kh, kw) == (3, 3)
    out = np.zeros((2, 2, 2, 2, cin, cout), k.dtype)  # [A,B,da,db,cin,cout]
    # u = orig row tap (0,1,2) <- (A, da): (0,0)->0, (0,1)->1, (1,0)->2
    taps = {(0, 0): 0, (0, 1): 1, (1, 0): 2}
    for (A, da), u in taps.items():
        for (B, db), v in taps.items():
            out[A, B, da, db] = k[u, v]
    return out.reshape(2, 2, 4 * cin, cout)


def conv_s2d(x, k2, bias=None):
    import jax
    import jax.numpy as jnp

    y = jax.lax.conv_general_dilated(
        x,
        k2.astype(x.dtype),
        window_strides=(1, 1),
        padding=((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return jax.nn.silu(y)


def main(batch=128):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_ms_tpu.utils.profiler import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    def timeit(fn, *args):
        _ = jax.device_get(fn(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = jax.device_get(fn(*args))
            ts.append((time.perf_counter() - t0) / K)
        return min(ts) * 1e3

    def scan(fn):
        @jax.jit
        def loop(*a):
            def body(c, i):
                return c + fn(i, *a), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(K))
            return acc

        return loop

    # v8-n stem: conv0 3->16 k3s2, conv1 16->32 k3s2
    for cin, cout, hw, tag in ((3, 16, 640, "conv0"), (16, 32, 320, "conv1")):
        k = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1
        b = rng.standard_normal((cout,)).astype(np.float32) * 0.1
        x = jax.device_put(
            jnp.asarray(rng.random((batch, hw, hw, cin)), jnp.bfloat16)
        )
        kj = jnp.asarray(k, jnp.bfloat16)
        bj = jnp.asarray(b, jnp.bfloat16)
        k2 = jnp.asarray(remap_kernel(k), jnp.bfloat16)

        def orig(i, x):
            xi = x + i.astype(x.dtype) * 1e-3
            y = jax.lax.conv_general_dilated(
                xi, kj, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jax.nn.silu(y + bj).astype(jnp.float32).mean()

        def s2d_form(i, x):
            xi = x + i.astype(x.dtype) * 1e-3
            y = conv_s2d(s2d(xi), k2, bj)
            return y.astype(jnp.float32).mean()

        # equivalence (f32, small input)
        xs = jnp.asarray(rng.random((2, hw, hw, cin)), jnp.float32)
        ya = jax.nn.silu(
            jax.lax.conv_general_dilated(
                xs, jnp.asarray(k), (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + jnp.asarray(b)
        )
        yb = conv_s2d(s2d(xs), jnp.asarray(remap_kernel(k)), jnp.asarray(b))
        np.testing.assert_allclose(
            np.asarray(ya), np.asarray(yb), rtol=1e-4, atol=1e-4
        )
        print(f"{tag}: S2D form EXACT (f32 {float(jnp.abs(ya - yb).max()):.2e})")

        t_orig = timeit(scan(orig), x)
        t_s2d = timeit(scan(s2d_form), x)
        print(
            f"{tag} [{batch},{hw},{hw},{cin}]->{cout}: "
            f"orig {t_orig:.3f} ms  s2d {t_s2d:.3f} ms"
        )


if __name__ == "__main__":
    main()

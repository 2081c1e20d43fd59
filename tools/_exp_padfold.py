"""Isolate the reflect-pad adjoint fold in the sparse-conv dx path.

The wave-25 dx trace (tools/logs/w25_trdx.log) shows the `jax.vjp` of
`_halo_pad` lowering to three sequential full-tensor pad_add fusions
(0.91 + 0.65 + 0.62 ms at the (2,64,64,64,128) train shape) plus a
0.49 ms slice — ~2.7 ms of glue around a 4.4 ms dx kernel. The adjoint
of a 1-block edge pad is just "crop + fold 6 halo planes into the edge
planes", so a hand-written slice + per-plane `.at[].add()` chain should
cost one crop pass + 6 tiny in-place DUS ops IF XLA keeps the updates
in place. This measures both forms (value-checked against each other).

Run via the TPU queue only.
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from anatomix_tpu.ops.pallas.conv_block_train import _halo_pad  # noqa: E402
from anatomix_tpu.utils.benchtools import pipeline_time  # noqa: E402

B, d, h, wd, C8 = 2, 64, 64, 64, 128
align = (-(wd + 2)) % 8  # _halo_pad's w alignment tail


def fold_vjp(dx_ext, x_shape):
    """Current production form: jax.vjp of the edge pad."""
    _, pad_vjp = jax.vjp(
        lambda v: _halo_pad(v, "reflect"), jnp.zeros(x_shape, dx_ext.dtype)
    )
    (dx,) = pad_vjp(dx_ext)
    return dx


def fold_hand(dx_ext):
    """Hand fold: sequential per-axis crop + edge-plane adds (reverse
    order of jnp.pad's axis application so corner contributions ride
    the already-folded planes, keeping exact equivalence)."""
    t = dx_ext
    # w axis (pad (1, 1+align), edge): fold left halo + right tail
    right = t[:, :, :, wd + 1:].astype(jnp.float32).sum(axis=3)
    t = t[:, :, :, 1: wd + 1]
    t = t.at[:, :, :, 0].add(dx_ext[:, :, :, 0])
    t = t.at[:, :, :, wd - 1].add(right.astype(t.dtype))
    # h axis
    hl, hr = t[:, :, 0], t[:, :, h + 1]
    t = t[:, :, 1: h + 1]
    t = t.at[:, :, 0].add(hl)
    t = t.at[:, :, h - 1].add(hr)
    # d axis
    dl, dr = t[:, 0], t[:, d + 1]
    t = t[:, 1: d + 1]
    t = t.at[:, 0].add(dl)
    t = t.at[:, d - 1].add(dr)
    return t


def main():
    rng = np.random.default_rng(0)
    x_shape = (B, d, h, wd, C8)
    ext_shape = (B, d + 2, h + 2, wd + 2 + align, C8)
    dx_ext = jnp.asarray(
        rng.standard_normal(ext_shape).astype(np.float32)
    ).astype(jnp.bfloat16)

    a = np.asarray(jax.jit(lambda v: fold_vjp(v, x_shape))(dx_ext),
                   np.float32)
    bv = np.asarray(jax.jit(fold_hand)(dx_ext), np.float32)
    err = np.abs(a - bv).max()
    print(f"max |vjp - hand| = {err:.3e}", flush=True)
    assert err <= 1e-2, "hand fold diverges from the pad VJP"

    # chain enough passes that device time clears the ~28 ms dispatch
    # floor (PERF.md trap #6); carry through the output to defeat probe
    # shrinking
    def chain(fold):
        def run(v):
            for _ in range(12):
                out = fold(v)
                v = jnp.pad(
                    out, ((0, 0), (1, 1), (1, 1), (1, 1 + align), (0, 0))
                )
            return out
        return run

    t_vjp = pipeline_time(
        chain(lambda v: fold_vjp(v, x_shape)), dx_ext, n=2, reps=3
    )
    t_hand = pipeline_time(chain(fold_hand), dx_ext, n=2, reps=3)
    print(f"fold via pad VJP : {t_vjp / 12 * 1e3:.3f} ms/fold", flush=True)
    print(f"fold hand-written: {t_hand / 12 * 1e3:.3f} ms/fold", flush=True)


if __name__ == "__main__":
    main()

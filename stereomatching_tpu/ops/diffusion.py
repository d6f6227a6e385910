"""Web hole-filling diffusion (reference ``fill_web_holes``,
src/stereo.c:230-251).

Reproduces the reference's exact double-buffer semantics: the pointer-swap
dance amounts to the two-history recurrence

    X[t+1][p] = (X[t][p] == 0) ? floor(avg4(X[t])[p]) : X[t-1][p]

returning X[times-1] (the final swap leaves the newest state in the freed
``tmp`` buffer).  Neighbors are the reference's raw flat-index offsets
p±1 / p±w (IDX with no wrapping, src/stereo.c:237-243): x-neighbors cross
row boundaries, and reads outside the buffer — undefined behavior in C —
are defined here as 0.  See oracle/pipeline.py for why this never affects
pipeline output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fill_web_holes(web: jnp.ndarray, times: int) -> jnp.ndarray:
    h, w = web.shape
    steps = max(times - 1, 0)
    if steps == 0:
        return web.astype(jnp.int32)

    def one_step(state, _):
        prev, cur = state
        f = cur.reshape(-1)
        right = jnp.pad(f[1:], (0, 1))  # IDX(x+1, y, w) == p+1
        down = jnp.pad(f[w:], (0, w))  # IDX(x, y+1, w) == p+w
        left = jnp.pad(f[:-1], (1, 0))  # IDX(x-1, y, w) == p-1
        up = jnp.pad(f[:-w], (w, 0))  # IDX(x, y-1, w) == p-w
        avg = (right + down + left + up) // 4  # values >= 0: C '/' == floor
        nxt = jnp.where(f == 0, avg, prev.reshape(-1)).reshape(h, w)
        return (cur, nxt), None

    cur = web.astype(jnp.int32)
    (_, out), _ = jax.lax.scan(one_step, (cur, cur), None, length=steps)
    return out

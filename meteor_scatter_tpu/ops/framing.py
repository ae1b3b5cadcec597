"""Signal framing under XLA's static-shape rules.

The reference frames with Python loops (`dsp/src/main.py:376-377`) or scipy
internals.  Here framing is a pure array transform so XLA can fuse it into
downstream matmuls/FFTs:

* hop == frame_len        -> a plain reshape (the batch analyzer's case),
* hop  | frame_len        -> ``frame_len//hop`` shifted reshapes interleaved
                             (covers the standard 50 % overlap STFT) — no
                             gather, layout-friendly,
* otherwise               -> gather with a precomputed index grid.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def num_frames(n_samples: int, frame_len: int, hop: int) -> int:
    """Number of full frames: matches the reference block loop
    ``len(x)//block_size`` when hop==frame_len (`main.py:356`) and scipy's
    ``(n - nperseg)//step + 1`` otherwise."""
    if n_samples < frame_len:
        return 0
    return (n_samples - frame_len) // hop + 1


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """Frame the last axis of ``x`` into ``(..., n_frames, frame_len)``.

    Only full frames are produced (trailing remainder dropped), matching both
    the reference's block loop and scipy's segmenting.
    """
    n = x.shape[-1]
    nf = num_frames(n, frame_len, hop)
    if nf <= 0:
        return jnp.zeros(x.shape[:-1] + (0, frame_len), dtype=x.dtype)

    if hop == frame_len:
        usable = nf * frame_len
        return x[..., :usable].reshape(x.shape[:-1] + (nf, frame_len))

    if frame_len % hop == 0:
        # k interleaved non-overlapping reshapes, k = frame_len // hop.
        k = frame_len // hop
        streams = []
        for j in range(k):
            off = j * hop
            nf_j = (nf - j + k - 1) // k  # frames with index ≡ j (mod k)
            usable = nf_j * frame_len
            s = x[..., off : off + usable]
            s = s.reshape(x.shape[:-1] + (nf_j, frame_len))
            streams.append(s)
        # Interleave: frame i comes from stream i % k at row i // k.
        pad_to = max(s.shape[-2] for s in streams)
        streams = [
            jnp.pad(s, [(0, 0)] * (s.ndim - 2) + [(0, pad_to - s.shape[-2]), (0, 0)])
            for s in streams
        ]
        stacked = jnp.stack(streams, axis=-2)  # (..., pad_to, k, frame_len)
        inter = stacked.reshape(x.shape[:-1] + (pad_to * k, frame_len))
        return inter[..., :nf, :]

    idx = np.arange(nf)[:, None] * hop + np.arange(frame_len)[None, :]
    return x[..., idx]

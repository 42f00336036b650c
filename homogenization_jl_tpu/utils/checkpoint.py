"""Checkpoint / resume for the homogenization recurrence.

The reference has no checkpointing (SURVEY.md §5); its closest artifact is
the per-step VTK dump. The recurrence state is small and explicit —
(sigma, lam, k, box_radius, finest x, v_prev, b, conductivity field, xi) —
so one compressed npz per outer step is enough to resume a multi-hour run.
"""

from __future__ import annotations

import numpy as np


def save_step(path: str, *, k, sigma, lam, box_radius, total_radius, x, b,
              v_prev, cond_field, xi, n, refinements) -> str:
    if not path.endswith(".npz"):
        path += ".npz"
    np.savez_compressed(
        path,
        k=k,
        sigma=sigma,
        lam=lam,
        box_radius=box_radius,
        total_radius=total_radius,
        x=np.asarray(x),
        b=np.asarray(b),
        v_prev=np.asarray(v_prev) if v_prev is not None else np.zeros(0),
        cond_field=np.asarray(cond_field),
        xi=np.asarray(xi),
        n=n,
        refinements=refinements,
    )
    return path


def load_step(path: str) -> dict:
    with np.load(path) as z:
        out = {key: z[key] for key in z.files}
    for key in ("k", "n", "refinements", "box_radius", "total_radius"):
        out[key] = int(out[key])
    for key in ("sigma", "lam"):
        out[key] = float(out[key])
    if out["v_prev"].size == 0:
        out["v_prev"] = None
    return out

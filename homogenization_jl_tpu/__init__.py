"""homogenization_jl_tpu — TPU-native framework for large-scale homogenization
of elliptic PDEs  -div(a(x) grad u) + lambda u = f  in 2D/3D.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the Julia reference
``haampie/Homogenization.jl``: the implicit fine grid (a coarse simplicial base
mesh where every element carries an identically refined reference element),
matrix-free geometric multigrid with a CG smoother, and the checkerboard
homogenized-coefficient recurrence with domain shrinking and lambda-halving.

Layer map (host precompute in NumPy, device compute in JAX):
  mesh/    — meshes, refinement, multilevel reference element
  fem/     — quadrature, dense reference operators, explicit assembly (oracle)
  ops/     — static grid tables (plan) + device kernels (apply/combine/transfer)
  solver/  — multigrid, CG, multishift CG
  models/  — Poisson demo, checkerboard homogenization driver
  parallel/— element-axis sharding (shard_map halo exchange over ICI)
  utils/   — VTK export, FFT random fields, checkpointing
"""

from .mesh.grid import Mesh, hypercube, interior_nodes
from .mesh.refine import refine_uniformly
from .mesh.reference import refined_reference
from .ops.plan import build_grid_plan
from .solver.multigrid import MultigridSolver

# Lazy top-level exports (PEP 562): the heavier user-facing entry points
# resolve on first use so `import homogenization_jl_tpu` stays light.
_LAZY = {
    "checkerboard_homogenization": ".models.checkerboard",
    "ShardedMultigridSolver": ".parallel.sharding",
    "SlabShardedMultigridSolver": ".parallel.slab",
    "st1_multigrid": ".models.st1",
    "multishift_cg": ".solver.cg",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name], __name__), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "Mesh",
    "hypercube",
    "interior_nodes",
    "refine_uniformly",
    "refined_reference",
    "build_grid_plan",
    "MultigridSolver",
    *sorted(_LAZY),
]

__version__ = "0.1.0"

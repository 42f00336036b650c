# Julia-reference parity harness (run against haampie/Homogenization.jl).
#
# Usage:
#   julia --project=<Homogenization.jl checkout> scripts/julia_parity.jl \
#         <field.txt> <n> <dim> <refinements> <tolerance>
#
# <field.txt> pins the random checkerboard conductivity (the only
# cross-language RNG dependence): header "n dim", then n^dim rows of dim
# values in Fortran order (first axis fastest) — exactly the layout of the
# reference's `Conductivity.σ` comprehension. The script overrides the
# package's own `generate_conductivity` to return the pinned field, then
# calls the unmodified `checkerboard_homogenization` driver and prints σ.
# tests/test_julia_parity.py runs this (skipped when no `julia` on PATH)
# and asserts rtol 1e-6 against the TPU framework's driver on the SAME
# field.

using Homogenization
using Homogenization: Mesh, Conductivity, generate_conductivity
using StaticArrays
using DelimitedFiles

field_file, n_s, dim_s, ref_s, tol_s = ARGS
n_steps = parse(Int, n_s)
dim = parse(Int, dim_s)
refinements = parse(Int, ref_s)
tolerance = parse(Float64, tol_s)

raw = readdlm(field_file)
ncells = Int(raw[1, 1])
@assert Int(raw[1, 2]) == dim
vals = raw[2:end, 1:dim]
@assert size(vals, 1) == ncells^dim
svecs = [SVector{dim,Float64}(vals[i, :]...) for i in 1:size(vals, 1)]
field = reshape(svecs, ntuple(_ -> ncells, dim))

# pin the field: override the package's sampler (same signature)
function Homogenization.generate_conductivity(m::Mesh{D}, nc::Int) where {D}
    @assert D == dim && nc == ncells "fixture size mismatch: $nc vs $ncells"
    Conductivity(nc, field)
end

ElT = dim == 2 ? Tri{Float64} : Tet{Float64}
ξ = SVector(ntuple(_ -> 1.0 / sqrt(dim), dim))
σ = checkerboard_homogenization(
    n_steps, ElT; refinements = refinements, tolerance = tolerance, ξ = ξ
)
println("SIGMA=", σ)

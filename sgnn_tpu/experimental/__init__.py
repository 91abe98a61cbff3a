"""Experimental (non-production) kernels.

Code here is correct and tested but NOT on any production dispatch
path — kept for revisiting when hardware/toolchain economics change.

edge_block: the fused Pallas edge-block kernel (edge MLP + LayerNorm +
mask + residual + aggregation in one VMEM pass, custom VJP). History:
it beat XLA in round 1's early stack (106.5 -> 70.7 ms/step at wide
neighbor slots) and was auto-dispatched at slots >= 20. After the
round-1-3 XLA-path work (symmetric gathers, packed tables, identity-dot
reduces, aggregation folds), a fresh isolated measurement (2026-08-20,
v5e, M=38376, D=64, fwd+bwd) put it at 10.62 ms vs XLA's 2.18 ms at the
production slot width (k=8, bf16) — the custom-call boundary
materializations dominate at narrow slots, and every production config
derives slots = 8. The auto-dispatch was therefore removed (maintained
surface == production surface); pass use_pallas=True to opt in.
"""

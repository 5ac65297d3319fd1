"""Column-level function surface (the engine's "standardizer" layer).

Reference analog: R/standardizers.R (~2,300 LoC of per-row vectorized
string canonicalization).  Here the cheap transforms are Catalyst
built-ins (JVM-side, whole-stage codegen) and only the genuinely
numeric-heavy signatures (MinHash, SimHash, pHash over decoded pixels)
drop to Arrow-batched pandas UDFs — never per-row Python (input_hint).
"""

"""Pure deterministic function bank — the single-source spec of the engine's
semantics, mirrored from go-pkg-spider call sites (file:line cited per
function). Row-at-a-time versions here double as the test oracle; the
``stages/`` package wraps them in vectorized batch kernels that must produce
identical outputs (property-tested in tests/)."""

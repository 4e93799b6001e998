"""Audio I/O, signal generation, timing/profiling harnesses
(counterpart of ``examples/util/mod.rs``)."""

"""Convolution engine families (the reference's L1 layer,
``src/fft_convolver.rs`` / ``src/crossfade_convolver.rs``)."""

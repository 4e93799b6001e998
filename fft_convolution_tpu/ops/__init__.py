"""FFT + DSP primitives (the reference's L0 layer,
``src/fft_convolver.rs:8-84``), plus Pallas TPU kernels."""

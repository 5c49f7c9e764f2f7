"""Pure, vectorized kernels. No Ray imports — testable standalone."""

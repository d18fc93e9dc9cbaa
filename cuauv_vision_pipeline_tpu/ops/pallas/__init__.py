"""Hand-written Pallas TPU kernels for the ops the XLA-compiled paths can't
reach speed-of-light on (currently: connected-component labeling)."""

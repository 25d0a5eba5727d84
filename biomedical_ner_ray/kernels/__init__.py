"""Pure, row-local kernels shared by the oracle and the Ray stages."""

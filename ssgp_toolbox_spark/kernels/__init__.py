"""Pure-numpy pixel kernels that run inside Arrow-batched pandas UDFs.

scikit-learn/scipy are not available in this environment, so the five
reference regression kernels (reference gapfiller.py:136-436), the
1-NN interpolation (gapfiller.py:901-967) and the kNN selection are
implemented from scratch in numpy. Semantics follow the cited
reference lines; numerics of the iterative solvers (Lasso CD, SVR
dual CD) are our own — parity tests for those use PSNR/MAE envelopes
per FIXTURES.md §4.
"""

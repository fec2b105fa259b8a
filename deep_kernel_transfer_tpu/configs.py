"""Global configuration — rebuild of reference configs.py:1-7.

kernel_type keeps the same default ('bncossim') but is ALSO exposed as a
real CLI flag (--kernel_type) instead of an edit-the-file constant
(SURVEY.md §5 config note)."""
import os

save_dir = "./save/"
data_dir = {
    "CUB": "./filelists/CUB/",
    "miniImagenet": "./filelists/miniImagenet/",
    "omniglot": "./filelists/omniglot/",
    "emnist": "./filelists/emnist/",
    "QMUL": "./filelists/QMUL/",
}
kernel_type = os.environ.get("DKT_KERNEL_TYPE", "bncossim")
# linear, rbf, spectral (regression only), matern, poli1, poli2, cossim, bncossim

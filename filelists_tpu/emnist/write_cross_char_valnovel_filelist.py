"""cross_char val/novel writer — reference
filelists/emnist/write_cross_char_valnovel_filelist.py:30-37: the 62
inverted EMNIST classes split even-index -> val, odd-index -> novel."""
import os
import sys
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import folder_split_filelists  # noqa: E402

if __name__ == "__main__":
    folder_split_filelists(
        join(os.getcwd(), "inv_emnist"), "./",
        {"val": lambda i: i % 2 == 0,
         "novel": lambda i: i % 2 == 1})

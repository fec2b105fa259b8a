"""CUB split writer — reference filelists/CUB/write_CUB_filelist.py:22-44:
class folders sorted, base = i%2==0, val = i%4==1, novel = i%4==3."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import folder_split_filelists  # noqa: E402

if __name__ == "__main__":
    folder_split_filelists(
        os.path.join(os.getcwd(), "CUB_200_2011", "images"), "./",
        {"base": lambda i: i % 2 == 0,
         "val": lambda i: i % 4 == 1,
         "novel": lambda i: i % 4 == 3})

#!/usr/bin/env bash
# reference filelists/QMUL/download_QMUL.sh
wget http://www.eecs.qmul.ac.uk/~sgg/QMUL_FaceDataset/QMULFaceDataset.zip
unzip QMULFaceDataset.zip
python write_QMUL_filelist.py

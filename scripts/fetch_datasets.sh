#!/usr/bin/env bash
# Fetch the real benchmark datasets named by BASELINE configs 4-5.
# The build container has no network egress; run this from any networked
# machine, then point cvsteer-vo at the extracted directories:
#
#   cvsteer-vo --input data/rgbd_dataset_freiburg1_xyz \
#       --set camera.fx=517.3 camera.fy=516.5 camera.cx=318.6 camera.cy=255.3
#   cvsteer-vo --input data/kitti/odometry/00 \
#       --set camera.fx=718.856 camera.fy=718.856 camera.cx=607.19 camera.cy=185.22
#
# (TUM fr1 intrinsics: https://cvg.cit.tum.de/data/datasets/rgbd-dataset;
#  KITTI odometry gray calibration from calib.txt P0.)
set -euo pipefail
mkdir -p data && cd data

echo "== TUM-RGBD fr1/xyz (config 4 smoke) =="
curl -LO https://cvg.cit.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_xyz.tgz
tar xzf rgbd_dataset_freiburg1_xyz.tgz

echo "== TUM-RGBD fr1/desk (config 4 headline) =="
curl -LO https://cvg.cit.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_desk.tgz
tar xzf rgbd_dataset_freiburg1_desk.tgz

echo "== KITTI odometry grayscale + poses (config 5; ~22 GB, needs login) =="
echo "KITTI requires registration: download data_odometry_gray.zip and"
echo "data_odometry_poses.zip from https://www.cvlibs.net/datasets/kitti/"
echo "then: unzip data_odometry_gray.zip; unzip data_odometry_poses.zip"

echo "done"

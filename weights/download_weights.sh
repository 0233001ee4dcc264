#!/bin/sh
# Fetch the official pretrained darknet binaries
# (parity with reference weights/download_weights.sh).
wget --header 'Referer: https://pjreddie.com/darknet/yolov3/' https://data.pjreddie.com/files/yolov3.weights
wget --header 'Referer: https://pjreddie.com/darknet/imagenet/' https://data.pjreddie.com/files/darknet53.conv.74

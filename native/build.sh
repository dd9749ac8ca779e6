#!/bin/sh
# Build the native host-ops library into the package.
set -e
cd "$(dirname "$0")"
OUT_DIR=../vjepa2_tpu/data/_native
mkdir -p "$OUT_DIR"
g++ -O3 -shared -fPIC -std=c++17 -pthread host_ops.cpp -o "$OUT_DIR/libhost_ops.so"
echo "built $OUT_DIR/libhost_ops.so"

# Native video decoder (libavformat/avcodec/swscale), built only when the
# libav dev headers exist on the host; the python side falls back to cv2.
if [ -e /usr/include/x86_64-linux-gnu/libavcodec/avcodec.h ] || [ -e /usr/include/libavcodec/avcodec.h ]; then
  g++ -O3 -shared -fPIC -std=c++17 -pthread video_decode.cpp \
    -lavformat -lavcodec -lavutil -lswscale \
    -o "$OUT_DIR/libvideo_decode.so"
  echo "built $OUT_DIR/libvideo_decode.so"
else
  echo "libav headers not found; skipping libvideo_decode.so (cv2 fallback)"
fi

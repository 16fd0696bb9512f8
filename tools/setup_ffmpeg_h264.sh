#!/usr/bin/env bash
# Build an H.264-capable ffmpeg from source into ~/bin for the offline frame
# extractors (tools/extract_frames.py --backend ffmpeg).
#
# TPU-native equivalent of the reference environment script
# (/root/reference/data/FaceForensics++/setup_ffmpeg_h264.sh): same
# capability — ffmpeg + libx264 built under $HOME so no root install of
# ffmpeg itself is needed — structured as idempotent steps with a
# prefer-system fast path. FaceForensics++ videos are H.264-in-mp4; a distro
# ffmpeg with libx264 is sufficient, so we only build from source when the
# system binary is missing or lacks h264 decode.
#
# Usage:
#   tools/setup_ffmpeg_h264.sh [--force-source]
#
# After a source build, binaries land in ~/bin (add to PATH).
set -euo pipefail

PREFIX="${FFMPEG_PREFIX:-$HOME/ffmpeg_build}"
BINDIR="${FFMPEG_BINDIR:-$HOME/bin}"
SRCDIR="${FFMPEG_SRCDIR:-$HOME/ffmpeg_sources}"
JOBS="$(nproc 2>/dev/null || echo 2)"
FORCE_SOURCE="${1:-}"

have_h264_ffmpeg() {
    command -v ffmpeg >/dev/null 2>&1 && \
        ffmpeg -hide_banner -decoders 2>/dev/null | grep -q '\bh264\b'
}

if [[ "$FORCE_SOURCE" != "--force-source" ]] && have_h264_ffmpeg; then
    echo "system ffmpeg already decodes h264: $(command -v ffmpeg)"
    exit 0
fi

echo "== installing build dependencies (requires sudo; skip errors if offline)"
if command -v apt-get >/dev/null 2>&1; then
    sudo apt-get update -qq || true
    sudo apt-get install -y autoconf automake build-essential cmake git \
        libtool pkg-config texinfo wget yasm nasm zlib1g-dev libx264-dev || true
fi

mkdir -p "$SRCDIR" "$BINDIR" "$PREFIX"
export PATH="$BINDIR:$PATH"
export PKG_CONFIG_PATH="$PREFIX/lib/pkgconfig"

echo "== building x264 (static, PIC)"
cd "$SRCDIR"
if [[ -d x264 ]]; then
    git -C x264 pull || true
else
    git clone --depth 1 https://code.videolan.org/videolan/x264.git
fi
cd x264
./configure --prefix="$PREFIX" --bindir="$BINDIR" --enable-static --enable-pic
make -j"$JOBS"
make install

echo "== building ffmpeg with libx264"
cd "$SRCDIR"
if [[ ! -d ffmpeg ]]; then
    wget -O ffmpeg-snapshot.tar.bz2 https://ffmpeg.org/releases/ffmpeg-snapshot.tar.bz2
    tar xjf ffmpeg-snapshot.tar.bz2
fi
cd ffmpeg
./configure \
    --prefix="$PREFIX" \
    --bindir="$BINDIR" \
    --pkg-config-flags="--static" \
    --extra-cflags="-I$PREFIX/include" \
    --extra-ldflags="-L$PREFIX/lib" \
    --extra-libs="-lpthread -lm" \
    --enable-gpl \
    --enable-libx264
make -j"$JOBS"
make install
hash -r

echo "== done: $("$BINDIR/ffmpeg" -version | head -1)"
echo "add to PATH if needed:  export PATH=\"$BINDIR:\$PATH\""

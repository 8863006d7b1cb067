#!/bin/sh
# Build the reference bwt-merge binaries against the mini-sdsl shim
# (scripts/refbuild/sdsl/) for differential testing.  Sources are compiled
# straight from /root/reference (read-only); nothing is copied into this
# repository.  Binaries land in scripts/refbuild/bin/.
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference}
OUT="$HERE/bin"
mkdir -p "$OUT"
CXXFLAGS="-std=c++11 -O2 -g -I$HERE -I$REF -pthread -DVERBOSE_STATUS_INFO"
OBJS=""
for src in utils support bwt formats fmi; do
  g++ $CXXFLAGS -c "$REF/$src.cpp" -o "$OUT/$src.o"
  OBJS="$OBJS $OUT/$src.o"
done
for tool in bwt_merge bwt_convert bwt_inspect; do
  g++ $CXXFLAGS "$REF/$tool.cpp" $OBJS -o "$OUT/$tool"
done
echo "built: $OUT/bwt_merge $OUT/bwt_convert $OUT/bwt_inspect"

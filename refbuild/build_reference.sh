#!/bin/bash
# Build the reference libff benchmark harnesses out-of-tree (reference stays
# read-only). Uses shim headers for GMP/OpenSSL (runtime .so present, dev
# headers absent in this image). Matches the BASELINE.md procedure:
# CURVE=ALT_BN128, MULTICORE=ON, USE_ASM=ON, BINARY_OUTPUT, MONTGOMERY_OUTPUT.
set -euo pipefail
cd "$(dirname "$0")"
REF=/root/reference/libff
OUT=obj
mkdir -p "$OUT" bin

CXX=g++
CXXFLAGS="-std=c++11 -O3 -march=native -DNDEBUG -fopenmp \
  -DCURVE_ALT_BN128 -DUSE_ASM -DMULTICORE -DBINARY_OUTPUT -DMONTGOMERY_OUTPUT \
  -DNO_PROCPS -DNO_PT_COMPRESSION \
  -I/root/reference -I$(pwd)/shim -Wno-deprecated-declarations"
LIBS="/usr/lib/x86_64-linux-gnu/libgmp.so.10 /usr/lib/x86_64-linux-gnu/libcrypto.so.3 -lrt -fopenmp"

# All library sources except tests/, profile/, and the bn128 (ate-pairing JIT) backend.
SRCS=$(find "$REF" -name '*.cpp' | grep -v '/tests/' | grep -v '/profile/' | grep -v '/bn128/' | sort)

OBJS=""
for s in $SRCS; do
  o="$OUT/$(echo "$s" | sed 's|/|_|g').o"
  OBJS="$OBJS $o"
  if [ ! -f "$o" ] || [ "$s" -nt "$o" ]; then
    echo "CXX $s"
    $CXX $CXXFLAGS -c "$s" -o "$o" &
    while [ "$(jobs -r | wc -l)" -ge 4 ]; do wait -n; done
  fi
done
wait

for prof in profile_multiexp profile_algebra_groups; do
  case $prof in
    profile_multiexp) src="$REF/algebra/scalar_multiplication/profile/profile_multiexp.cpp";;
    profile_algebra_groups) src="$REF/algebra/curves/profile/profile_algebra_groups.cpp";;
  esac
  echo "LINK bin/$prof"
  $CXX $CXXFLAGS "$src" $OBJS $LIBS -o "bin/$prof"
done
echo OK

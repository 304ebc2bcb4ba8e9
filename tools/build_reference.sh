#!/bin/sh
# Build the reference PhyML binary for parity/benchmark oracles.
# The image lacks autotools, so compile directly (plain C99); the
# source list is phyml_SOURCES from /root/reference/src/Makefile.am
# (+ mcmc.c, which date.c links against).
# Usage: tools/build_reference.sh [output-path]
set -e
OUT="${1:-/tmp/phyml-bin}"
SRC=/tmp/phyml-ref
if [ ! -d "$SRC" ]; then
  cp -r /root/reference "$SRC"
  chmod -R u+w "$SRC"
fi
cd "$SRC/src"
gcc -O2 -std=gnu99 -DPHYML -DUNIX -I.. -mavx2 -mfma -o "$OUT" \
  main.c utilities.c optimiz.c lk.c bionj.c models.c free.c help.c \
  simu.c eigen.c pars.c alrt.c interface.c cl.c spr.c draw.c stats.c \
  io.c make.c nexus.c init.c xml.c sse.c avx.c tbe.c ancestral.c \
  mixt.c evolve.c rates.c date.c times.c m4.c cv.c mcmc.c \
  -lm
echo "built $OUT"

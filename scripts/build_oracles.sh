#!/bin/sh
# Build the differential-test oracle binaries from the read-only reference
# tree at /root/reference into gitignored directories:
#
#   .lagan_build/  — the reference LAGAN toolkit (chaos, order, mlagan,
#                    prolagan, glocal, utils/*, Perl drivers), built from
#                    /root/reference/src/lagan with -fcommon added for
#                    modern gcc.  Used by the SIBELIA_TPU_GOLDEN=1 byte-
#                    parity tests (tests/test_lagan_exact.py etc.).
#   .ref_build/    — the reference Sibelia binary, built from
#                    /root/reference/src with CMake.  Used by the golden
#                    e2e parity suite (tests/test_golden_parity.py) and
#                    bench.py's e2e comparison.
#
# Both directories contain reference-derived content and MUST stay out of
# git (see .gitignore).  Re-run this script after a clean checkout.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF=/root/reference

if [ ! -d "$REF/src/lagan" ]; then
    echo "reference tree not found at $REF" >&2
    exit 1
fi

# --- LAGAN toolkit -------------------------------------------------------
if [ ! -x "$REPO/.lagan_build/mlagan" ]; then
    echo "== building LAGAN oracles into .lagan_build/"
    rm -rf "$REPO/.lagan_build"
    cp -r "$REF/src/lagan" "$REPO/.lagan_build"
    chmod -R u+w "$REPO/.lagan_build"
    # Pre-C99 tentative definitions: modern gcc needs -fcommon.
    sed -i 's/^CFLAGS = -O3/CFLAGS = -O3 -fcommon/' "$REPO/.lagan_build/src/Makefile"
    (cd "$REPO/.lagan_build" && CFLAGS="-fcommon -O3" make > build.log 2>&1) || {
        tail -20 "$REPO/.lagan_build/build.log" >&2; exit 1; }
    echo "   ok: $(ls "$REPO/.lagan_build" | tr '\n' ' ' | cut -c1-70)..."
else
    echo "== .lagan_build already built"
fi

# --- Sibelia binary ------------------------------------------------------
if [ ! -x "$REPO/.ref_build/Sibelia" ]; then
    echo "== building reference Sibelia into .ref_build/"
    mkdir -p "$REPO/.ref_build/build"
    (cd "$REPO/.ref_build/build" \
     && cmake "$REF/src" -DCMAKE_BUILD_TYPE=Release \
          -DCMAKE_CXX_FLAGS="-w -fpermissive -std=c++03" > cmake.log 2>&1 \
     && make -j2 > make.log 2>&1) || {
        tail -20 "$REPO/.ref_build/build/make.log" >&2; exit 1; }
    cp "$REPO/.ref_build/build/Sibelia" "$REPO/.ref_build/Sibelia"
    echo "   ok: .ref_build/Sibelia"
else
    echo "== .ref_build/Sibelia already built"
fi
echo "oracles ready"

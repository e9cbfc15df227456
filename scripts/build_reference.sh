#!/bin/bash
# Build the UNMODIFIED reference binaries (run_OF_INT/RGB, run_DE_INT/RGB)
# out-of-tree for golden-file capture and baseline re-measurement
# (SURVEY.md §4 item 1, §6).  Eigen headers come from the TensorFlow wheel
# (header-only); OpenCV 4.x needs the legacy-constant shim + C++17 (the
# bundled Eigen requires >= C++14; the reference's own flags say C++11,
# CMakeLists.txt:4).
set -e
OUT=${1:-/tmp/refbuild}
mkdir -p "$OUT"
EIG=$(python -c "import tensorflow, pathlib; print(pathlib.Path(tensorflow.__file__).parent / 'include')" 2>/dev/null || echo /opt/venv/lib/python3.12/site-packages/tensorflow/include)
REF=/root/reference
CXXSRC="$REF/run_dense.cpp $REF/oflow.cpp $REF/patch.cpp $REF/patchgrid.cpp $REF/refine_variational.cpp"
CSRC="$REF/FDF1.0.1/image.c $REF/FDF1.0.1/opticalflow_aux.c $REF/FDF1.0.1/solver.c"
CXXFLAGS="-O3 -Wno-unknown-pragmas -std=c++17 -msse4 -I$EIG -I$REF -include $(dirname "$0")/refbuild_compat.h $(pkg-config --cflags opencv4)"
CFLAGS="-O3 -Wno-unknown-pragmas -msse4"
LIBS=$(pkg-config --libs opencv4)
# run_OF_GRAD (SELECTCHANNEL==2, gradient-magnitude input) exists in the code
# but has no CMake target in the reference (SURVEY.md §1); build it too so the
# gradmag_input path can be golden-tested.
for tgt in "run_OF_INT 1 1" "run_OF_RGB 1 3" "run_DE_INT 2 1" "run_DE_RGB 2 3" "run_OF_GRAD 1 2"; do
  set -- $tgt
  name=$1; mode=$2; chan=$3
  if [ ! -x "$OUT/$name" ]; then
    echo "building $name..."
    objs=""
    for c in $CSRC; do
      o="$OUT/$(basename "$c" .c)_m${mode}c${chan}.o"
      gcc $CFLAGS -DSELECTMODE=$mode -DSELECTCHANNEL=$chan -c "$c" -o "$o"
      objs="$objs $o"
    done
    g++ $CXXFLAGS -DSELECTMODE=$mode -DSELECTCHANNEL=$chan $CXXSRC $objs $LIBS -o "$OUT/$name"
    rm -f $objs
  fi
done
echo "reference binaries in $OUT"

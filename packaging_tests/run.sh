#!/usr/bin/env bash
# Packaging integration test — the analog of the reference's Dockerfile.test
# (TEST 1..3: FetchContent / cmake install / pkg-config consumers, each
# running an asserting quick-start binary).  Here:
#   TEST 1: build a wheel, install it into a clean venv, run the asserting
#           consumer against the installed package;
#   TEST 2: same from the sdist (exercises the source distribution's file
#           manifest, not just the built wheel);
#   TEST 3: import-surface check — every public symbol the README documents
#           resolves from the installed package.
#
# Offline-friendly: venvs use --system-site-packages so the jax/numpy deps
# resolve without network; the package itself installs with --no-deps
# --no-build-isolation, which is exactly what would catch a broken manifest.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d /tmp/cppns_pkg_test.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT
cd "$REPO"

echo "== build sdist + wheel =="
rm -rf "$WORK/dist"
python -m pip wheel . --no-deps --no-build-isolation -w "$WORK/dist" -q
# sdist via setuptools' build_meta backend (no `build` package needed).
python - "$WORK/dist" <<'EOF'
import sys
from setuptools import build_meta
print("sdist:", build_meta.build_sdist(sys.argv[1]))
EOF
WHEEL="$(ls "$WORK"/dist/*.whl)"
SDIST="$(ls "$WORK"/dist/*.tar.gz)"
echo "wheel: $WHEEL"
echo "sdist: $SDIST"

# The host interpreter may itself be a venv (whose site-packages a child
# venv's --system-site-packages does NOT inherit); expose the host's
# dependency site explicitly via a .pth file.
HOST_SITE="$(python -c 'import numpy, os; print(os.path.dirname(os.path.dirname(numpy.__file__)))')"

run_consumer() {
  local venv="$1" artifact="$2" label="$3"
  echo "== $label: install + consumer =="
  python -m venv "$venv"
  local site
  site="$("$venv/bin/python" -c 'import site; print(site.getsitepackages()[0])')"
  echo "$HOST_SITE" > "$site/host_deps.pth"
  "$venv/bin/python" -m pip install --no-deps --no-build-isolation -q "$artifact"
  # Run from a neutral cwd so the repo checkout can't shadow the install.
  (cd "$WORK" && "$venv/bin/python" "$REPO/packaging_tests/consumer.py")
}

run_consumer "$WORK/venv_wheel" "$WHEEL" "TEST 1 (wheel)"
run_consumer "$WORK/venv_sdist" "$SDIST" "TEST 2 (sdist)"

echo "== TEST 3: public import surface =="
(cd "$WORK" && "$WORK/venv_wheel/bin/python" - <<'EOF'
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import cppnumericalsolvers_tpu as cns
for sym in (
    "minimize", "minimize_batched", "resume", "objective", "Objective",
    "FunctionState", "Status", "default_stopping", "conservative_stopping",
    "ConstrainedProblem", "constant", "min_zero", "max_zero",
):
    assert hasattr(cns, sym), f"missing public symbol: {sym}"
from cppnumericalsolvers_tpu.solvers import (
    GradientDescent, ConjugateGradientDescent, NewtonDescent, Bfgs, Lbfgs,
    Lbfgsb, TrustRegionNewton, NelderMead, AugmentedLagrangian,
)
from cppnumericalsolvers_tpu.parallel import minimize_sharded
from cppnumericalsolvers_tpu.utils.derivatives import (
    compute_finite_gradient, is_gradient_correct,
)
print("import surface: ok")
EOF
)

echo "packaging tests: ALL PASSED"

#!/usr/bin/env bash
# Package the engine and launch a validation run via spark-submit,
# the north-rule launch shape: spark-submit --py-files validr_spark.zip.
#
#   tools/submit.sh local[8] validate --input ... --schema ... --part-col ...
#
# On a real cluster, replace the master with yarn/k8s; the zip is the only
# artifact executors need.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:?master (e.g. local[8], yarn)}"
shift

# Build the --py-files artifact from the INSTALLED distribution when one
# exists (pip install -e . / setup.py develop — pyproject.toml is the
# canonical metadata), falling back to the repo checkout: the same zip
# shape either way, so executors never depend on the driver's sys.path.
ZIP="$(mktemp -d)/validr_spark.zip"
PKG_PARENT="$(python - <<'EOF' || true
import os
try:
    import validr_spark
except Exception:
    raise SystemExit(1)
print(os.path.dirname(os.path.dirname(os.path.abspath(
    validr_spark.__file__))))
EOF
)"
SRC_DIR="${PKG_PARENT:-$REPO}"
# A stale NON-editable install would silently ship old code: editable
# installs resolve back into the checkout, anything else gets a loud
# pointer so the divergence is visible before the job runs.
if [ -n "$PKG_PARENT" ] && [ "$PKG_PARENT" != "$REPO" ]; then
    echo "submit.sh: packaging the INSTALLED distribution at" \
         "$PKG_PARENT/validr_spark (not the checkout $REPO/validr_spark;" \
         "pip install -e to track the repo)" >&2
fi
(cd "$SRC_DIR" && python - "$ZIP" <<'EOF'
import sys, zipfile, pathlib
zf = zipfile.ZipFile(sys.argv[1], "w", zipfile.ZIP_DEFLATED)
pkg = pathlib.Path("validr_spark")
for p in sorted(pkg.rglob("*")):
    if p.suffix in (".py", ".pyi") or p.name == "py.typed":
        zf.write(p, p.as_posix())
zf.close()
print("packaged", sys.argv[1])
EOF
)

DRIVER="$(mktemp -d)/driver.py"
cat > "$DRIVER" <<'EOF'
import sys
from validr_spark.cli import main
sys.exit(main(sys.argv[1:]))
EOF

# SPARK_SUBMIT_FLAGS: optional extra spark-submit flags, e.g.
#   SPARK_SUBMIT_FLAGS="--driver-memory 8g --conf spark.local.dir=/dev/shm/spark-local"
# shellcheck disable=SC2086
exec spark-submit --master "$MASTER" \
    --conf spark.sql.adaptive.enabled=true \
    ${SPARK_SUBMIT_FLAGS:-} \
    --py-files "$ZIP" \
    "$DRIVER" "$@"

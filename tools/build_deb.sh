#!/usr/bin/env bash
# Build the gisnav-tpu Debian package (the reference ships an analogous
# gisnav .deb, debian/gisnav/ in hmakelin/gisnav; this stages our own
# layout and runs dpkg-deb).
#
# Usage: tools/build_deb.sh [OUTPUT_DIR]     (default: dist/)
set -euo pipefail

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-$ROOT/dist}"
VERSION="$(sed -n 's/^version = "\(.*\)"/\1/p' "$ROOT/pyproject.toml")"
ARCH=all
STAGE="$(mktemp -d)"
trap 'rm -rf "$STAGE"' EXIT

PKG="$STAGE/gisnav-tpu_${VERSION}_${ARCH}"

# python package -> dist-packages
SITE="$PKG/usr/lib/python3/dist-packages"
mkdir -p "$SITE"
cp -r "$ROOT/gisnav_tpu" "$SITE/"
find "$SITE" -name "__pycache__" -type d -exec rm -rf {} + 2>/dev/null || true

# bundled weights
mkdir -p "$PKG/usr/share/gisnav-tpu"
cp -r "$ROOT/weights" "$PKG/usr/share/gisnav-tpu/weights"

# CLI entry point
mkdir -p "$PKG/usr/bin"
cat > "$PKG/usr/bin/gisnav-tpu" <<'SH'
#!/bin/sh
export GISNAV_TPU_WEIGHTS_DIR=${GISNAV_TPU_WEIGHTS_DIR:-/usr/share/gisnav-tpu/weights}
exec python3 -m gisnav_tpu "$@"
SH
chmod 755 "$PKG/usr/bin/gisnav-tpu"

# systemd unit
mkdir -p "$PKG/etc/systemd/system"
cp "$ROOT"/deploy/systemd/*.service "$PKG/etc/systemd/system/"

# docs
mkdir -p "$PKG/usr/share/doc/gisnav-tpu"
cp "$ROOT/README.md" "$PKG/usr/share/doc/gisnav-tpu/"
cp -r "$ROOT/docs" "$PKG/usr/share/doc/gisnav-tpu/docs"

# control files
mkdir -p "$PKG/DEBIAN"
cat > "$PKG/DEBIAN/control" <<EOF
Package: gisnav-tpu
Version: $VERSION
Section: science
Priority: optional
Architecture: $ARCH
Depends: python3 (>= 3.10), python3-numpy
Recommends: docker-compose-v2
Maintainer: gisnav_tpu maintainers
Description: TPU-native map-based visual navigation for drones
 GNSS-free global positioning: camera frames matched against WMS
 orthoimagery on a TPU (JAX/XLA/Pallas), fused with visual odometry,
 published to the autopilot as a mock GPS (uORB / NMEA / u-blox).
 .
 jax, flax, optax and orbax-checkpoint must be installed separately
 (accelerator-specific builds; see /usr/share/doc/gisnav-tpu/docs).
EOF

cat > "$PKG/DEBIAN/postinst" <<'EOF'
#!/bin/sh
set -e
if command -v systemctl >/dev/null 2>&1; then
    systemctl daemon-reload || true
fi
exit 0
EOF
chmod 755 "$PKG/DEBIAN/postinst"

cat > "$PKG/DEBIAN/postrm" <<'EOF'
#!/bin/sh
set -e
if command -v systemctl >/dev/null 2>&1; then
    systemctl daemon-reload || true
fi
exit 0
EOF
chmod 755 "$PKG/DEBIAN/postrm"

mkdir -p "$OUT"
dpkg-deb --build --root-owner-group "$PKG" \
    "$OUT/gisnav-tpu_${VERSION}_${ARCH}.deb"
echo "built $OUT/gisnav-tpu_${VERSION}_${ARCH}.deb"

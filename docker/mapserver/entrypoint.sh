#!/bin/bash
# GIS container entrypoint: seed demo rasters, keep the VRT mosaics fresh,
# run Apache (MapServer + TinyOWS CGI).
#
# Raster lifecycle: anything dropped into /etc/mapserver/maps/imagery or
# /etc/mapserver/maps/dem (GeoTIFF or a .zip of them — e.g. uploaded through
# the fileserver service) is mosaicked into imagery.vrt / dem.vrt. A
# periodic rebuild loop (10 s) replaces the reference's inotify watcher:
# restart-proof, no daemon dependency, and a VRT rebuild over a handful of
# rasters costs milliseconds.
set -euo pipefail

MAPS_ROOT=/etc/mapserver/maps
DEMO_ROOT=/opt/gisnav/demo-maps
REBUILD_INTERVAL="${GISNAV_VRT_REBUILD_S:-10}"

mkdir -p "$MAPS_ROOT/imagery" "$MAPS_ROOT/dem"

# First start on an empty volume: seed the built-in demo world so
# `docker compose up` yields a working GetMap with zero manual raster steps.
if ! ls "$MAPS_ROOT/imagery"/*.tif >/dev/null 2>&1 && [ -d "$DEMO_ROOT" ]; then
    echo "[gis] seeding demo rasters into $MAPS_ROOT"
    cp -v "$DEMO_ROOT"/imagery/*.tif "$MAPS_ROOT/imagery/" || true
    cp -v "$DEMO_ROOT"/dem/*.tif "$MAPS_ROOT/dem/" || true
fi

extract_uploads() {
    # unpack uploaded .zip archives in place, then drop the archive
    local dir=$1
    local z
    for z in "$dir"/*.zip; do
        [ -e "$z" ] || continue
        echo "[gis] extracting $z"
        unzip -o "$z" -d "$dir" && rm -f "$z"
    done
}

rebuild_vrt() {
    # gdalbuildvrt only when the raster set changed (mtime-stamp compare)
    local dir=$1 vrt=$2 stamp
    stamp=$(ls -l "$dir" 2>/dev/null | sha256sum | cut -d' ' -f1)
    local stampfile="/tmp/vrt-stamp-$(basename "$vrt")"
    if [ -f "$stampfile" ] && [ "$(cat "$stampfile")" = "$stamp" ]; then
        return 0
    fi
    local files=("$dir"/*.tif "$dir"/*.tiff "$dir"/*.jp2 "$dir"/*.img)
    local existing=()
    local f
    for f in "${files[@]}"; do [ -e "$f" ] && existing+=("$f"); done
    if [ "${#existing[@]}" -gt 0 ]; then
        echo "[gis] rebuilding $vrt from ${#existing[@]} raster(s)"
        gdalbuildvrt -overwrite "/etc/mapserver/$vrt" "${existing[@]}"
    fi
    echo "$stamp" > "$stampfile"
}

vrt_loop() {
    while true; do
        extract_uploads "$MAPS_ROOT/imagery"
        extract_uploads "$MAPS_ROOT/dem"
        rebuild_vrt "$MAPS_ROOT/imagery" imagery.vrt
        rebuild_vrt "$MAPS_ROOT/dem" dem.vrt
        sleep "$REBUILD_INTERVAL"
    done
}

# initial build so the WMS answers immediately, then keep fresh in background
extract_uploads "$MAPS_ROOT/imagery"
extract_uploads "$MAPS_ROOT/dem"
rebuild_vrt "$MAPS_ROOT/imagery" imagery.vrt
rebuild_vrt "$MAPS_ROOT/dem" dem.vrt
vrt_loop &

# stale apache runtime files survive container restarts on a volume
rm -f /var/run/apache2/apache2.pid

exec "$@"

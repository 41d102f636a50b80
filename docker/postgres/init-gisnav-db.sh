#!/bin/bash
# PostGIS schema bootstrap for the gisnav feature store.
#
# Runs once from /docker-entrypoint-initdb.d on first `docker compose up`
# (the postgres image's init hook). Creates the feature.position table that
# TinyOWS writes (WFS-T inserts from the WFSTNode) and MapServer's WFS
# reads (admin dashboard track map) — see docker/mapserver/etc/tinyows.xml
# and docker/mapserver/mapfiles/gisnav.map for the two consumers.
#
# POSTGRES_DB=gisnav is set in compose, so the target database already
# exists when init scripts run.
set -euo pipefail

psql -v ON_ERROR_STOP=1 --username "$POSTGRES_USER" --dbname "$POSTGRES_DB" <<'EOSQL'
    CREATE EXTENSION IF NOT EXISTS postgis;

    CREATE SCHEMA IF NOT EXISTS feature;

    CREATE TABLE IF NOT EXISTS feature.position (
        id        SERIAL PRIMARY KEY,
        geom      GEOMETRY(Point, 4326),
        timestamp TIMESTAMPTZ DEFAULT NOW()
    );

    -- TinyOWS discovers writable layers through the geometry_columns view;
    -- an explicit GRANT keeps this working if the service user ever
    -- diverges from the table owner.
    GRANT USAGE ON SCHEMA feature TO PUBLIC;
    GRANT SELECT, INSERT, DELETE ON feature.position TO PUBLIC;
    GRANT USAGE, SELECT ON SEQUENCE feature.position_id_seq TO PUBLIC;
EOSQL

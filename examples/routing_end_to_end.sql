-- Routing end-to-end, statement for statement the reference's script shape
-- (compare /root/reference examples: monaco_end_to_end.sql) on a Spark
-- session built with spark.sql.extensions=graft.GraftExtensions and
-- graft.routing.RoutingContext.install(spark).

-- Build a tile set from a PBF (local path or any Hadoop-FS URI:
-- http(s)://, s3a://, hdfs://) and load it. Both functions execute
-- driver-side at plan time via the injected optimizer rule, so they work
-- as a session's first statements.
SELECT valhalla_build_tiles('/data/monaco.osm.pbf', '/data/monaco-tiles');
SELECT travel_time_load_config('/data/monaco-tiles');
SELECT travel_time_is_loaded();          -- true
SELECT travel_time_node_count();         -- graph size sanity check

-- Point-to-point travel time (seconds) per costing mode.
SELECT travel_time(43.7384, 7.4246, 43.7396, 7.4263, 'auto')    AS drive_s,
       travel_time(43.7384, 7.4246, 43.7396, 7.4263, 'bicycle') AS bike_s,
       travel_time(43.7384, 7.4246, 43.7396, 7.4263, 'pedestrian') AS walk_s;

-- Route geometry: WKT in, WKB LINESTRING out (st_* shims decode).
SELECT st_astext(st_geomfromwkb(
         travel_time_route_wkb('POINT(7.4246 43.7384)',
                               'POINT(7.4263 43.7396)', 'auto'))) AS route_wkt;

-- Snap arbitrary coordinates to the road network.
SELECT travel_time_locate(43.7384, 7.4246, 'auto') AS snapped;

-- N x M origin-destination matrix: array result, one row per pair after
-- explode (m carries from_idx, to_idx, distance_m, duration_s).
SELECT m.from_idx, m.to_idx, m.distance_m, m.duration_s
FROM (SELECT explode(travel_time_matrix(
  array(43.7384, 43.7396), array(7.4246, 7.4263),   -- origins (lat, lon)
  array(43.7401, 43.7379), array(7.4197, 7.4290),   -- destinations
  'auto')) AS m)
ORDER BY m.from_idx, m.to_idx;

-- 5/10/15-minute isochrone contours as GeoJSON (concave hulls).
SELECT travel_time_isochrone_geojson(43.7384, 7.4246,
                                     array(5.0D, 10.0D, 15.0D), 'auto') AS geojson;

-- Valhalla-shaped JSON request API: all nine actions dispatch
-- (route, matrix, sources_to_targets, locate, isochrone, optimized_route,
-- trace_route, trace_attributes, height, status).
SELECT travel_time_request('status', '{}') AS status_json;
SELECT travel_time_request('trace_route',
  '{"shape":[{"lat":43.7384,"lon":7.4246},{"lat":43.7396,"lon":7.4263}],
    "costing":"auto"}') AS trace_json;

-- Catalog introspection, the reference's registration-test shape verbatim
-- (its test/sql/travel_time.test uses duckdb_functions()): every routing
-- function is discoverable once registered, and typeof inspects result
-- types (BINARY here where DuckDB says BLOB).
SELECT function_name FROM graft_functions()
WHERE function_name = 'travel_time';                        -- travel_time
SELECT count(*) FROM graft_functions()
WHERE function_name = 'travel_time_route_wkb';              -- 1
SELECT typeof(travel_time_route_wkb(
  'POINT(7.4246 43.7384)', 'POINT(7.4263 43.7396)', 'auto').geometry);  -- binary

-- Multi-stop routes and exclusions: one leg per consecutive location pair
-- (the reference decoder loops trip.legs[]); exclude_locations snaps each
-- blocked point to its road node and the search detours around it.
SELECT travel_time_request('route',
  '{"locations":[{"lat":43.7384,"lon":7.4246},{"lat":43.7396,"lon":7.4263},
                 {"lat":43.7410,"lon":7.4280}],
    "exclude_locations":[{"lat":43.7390,"lon":7.4255}],
    "costing":"auto"}') AS via_json;

-- The reference's geometry-macro example, VERBATIM (examples/
-- geometry_macro.sql): CREATE MACRO registers an untyped SQL macro whose
-- call sites inline at parse time (lazy binding, like the host engine);
-- struct_pack folds to named_struct. Shadowing the built-in name with a
-- macro is exactly what the reference example does.
CREATE OR REPLACE MACRO travel_time_route(from_geom, to_geom, costing) AS (
    SELECT struct_pack(
        distance_km := r.distance_km,
        duration_minutes := r.duration_minutes,
        geometry := ST_GeomFromWKB(r.geometry)
    ) FROM (SELECT travel_time_route_wkb(from_geom, to_geom, costing) as r)
);
SELECT travel_time_route('POINT(7.4246 43.7384)',
                         'POINT(7.4263 43.7396)', 'auto').distance_km;

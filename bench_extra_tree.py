"""Run the headline per-query timing against an arbitrary repo tree
(r6-vs-HEAD interleaved A/B; results keyed by tree path)."""
import os, sys, time, json
root, runs = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, root); os.chdir(root)
import bench
from pdfextraction_spark.session import build_session
spark = build_session("abfull", master="local[32]", shuffle_partitions=32)
import __spark_entry__ as entrymod
qs = {**entrymod.queries(), **bench.production_queries()}
bsf = bench.ensure_parallel_sf(bench.SF_DIR, n_files=32)
qs["group_stats"](spark, bsf).count()
out = {}
for name in bench.HEADLINE:
    fn = qs[name]
    try:
        bench._force(fn(spark, bsf))
        ws = []
        for _ in range(runs):
            t0 = time.time(); bench._force(fn(spark, bsf)); ws.append(round(time.time() - t0, 3))
        out[name] = ws
    except Exception as ex:
        out[name] = str(ex)[:80]
print("TREE", root, json.dumps(out), flush=True)
spark.stop()

import outdoor_nerf_depth_tpu as _ondt
_ondt.apply_platform_env()
_ondt.enable_compilation_cache()
import os, time, json
os.environ.setdefault("ONDT_BENCH_WORKLOADS", "ngp")
import bench
r = bench._with_timeout(bench.bench_ngp_train)
print(json.dumps({"ngp_8192_quad": r}))

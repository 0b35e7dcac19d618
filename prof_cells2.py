import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from sph_nca_tpu.ops.cells import build_cell_engine
from sph_nca_tpu.models import SPHNCAConfig, init_params
from sph_nca_tpu.models.cell_step import nca_step_cells
from sph_nca_tpu.utils.meshes import fibonacci_sphere

N = 102_400
x_np = fibonacci_sphere(N)
area = 4.0*np.pi*0.8**2/N
h = float(np.sqrt(30.0*area/np.pi))
eng = build_cell_engine(x_np, h)
cfg = SPHNCAConfig(normalize_perception=1.0/h)
params = init_params(jax.random.key(0), cfg)
S0 = eng.scatter(jax.random.uniform(jax.random.key(1), (N, 16)))
R = 30

def scan_time(name, step):
    @jax.jit
    def run(eng, S):
        def body(c, _):
            out = step(eng, S + c)
            return c + 1e-12*jnp.sum(out), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
        return c
    _ = np.asarray(run(eng, S0))
    t0=time.perf_counter(); _ = np.asarray(run(eng, S0))
    print(f"{name:40s} {(time.perf_counter()-t0-0.04)/R*1e3:8.2f} ms", flush=True)

scan_time("window gather", lambda e, S: e.window(S))
scan_time("blur (gather+einsum)", lambda e, S: e.blur(S))
scan_time("gradient (gather+moment matmul)", lambda e, S: e.gradient(S))
scan_time("mask einsum only", lambda e, S: jnp.einsum('cmw,cw->cm', e.Tw, e.window(S)[...,3]))
from sph_nca_tpu.models.nca import apply_mlp
scan_time("mlp on cell layout", lambda e, S: apply_mlp(params, jnp.concatenate([S,S,S],-1)))
scan_time("full nca_step_cells", lambda e, S: nca_step_cells(params, cfg, e, S, jax.random.key(2), h))

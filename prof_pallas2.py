import time, sys, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from sph_nca_tpu.ops.cells import build_cell_engine
from sph_nca_tpu.ops.pallas.pair_kernel import fused_perception_pallas, mask_blur_pallas
from sph_nca_tpu.models import SPHNCAConfig, init_params
from sph_nca_tpu.utils.meshes import fibonacci_sphere

def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

N = 102_400
x_np = fibonacci_sphere(N)
area = 4.0*np.pi*0.8**2/N
h = float(np.sqrt(30.0*area/np.pi))
log("building engine")
eng = build_cell_engine(x_np, h)
log(f"C={eng.num_cells} M={eng.slots_per_cell} P={eng.blk_xs.shape[1]} W={eng.blk_xw.shape[1]} nb={eng.blk_win_cells.shape[0]}")
S0 = eng.scatter(jax.random.uniform(jax.random.key(1), (N, 16)))
log("compiling fused fwd")
f = jax.jit(lambda e, S: fused_perception_pallas(e, S, use_alpha=True))
out = f(eng, S0); _ = np.asarray(out[0].ravel()[:1])
log("fused fwd ran")
R=30
@jax.jit
def rep(e, S):
    def body(c, _):
        ga, sm = fused_perception_pallas(e, S + c, use_alpha=True)
        return c + 1e-12*(jnp.sum(ga)+jnp.sum(sm)), None
    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
    return c
_ = np.asarray(rep(eng, S0))
t0=time.perf_counter(); _ = np.asarray(rep(eng, S0))
log(f"fused perception: {(time.perf_counter()-t0-0.04)/R*1e3:.2f} ms")
@jax.jit
def repm(e, S):
    def body(c, _):
        sm = mask_blur_pallas(e, S + c, use_alpha=True)
        return c + 1e-12*jnp.sum(sm), None
    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
    return c
_ = np.asarray(repm(eng, S0))
t0=time.perf_counter(); _ = np.asarray(repm(eng, S0))
log(f"mask blur: {(time.perf_counter()-t0-0.04)/R*1e3:.2f} ms")

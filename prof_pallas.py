import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from sph_nca_tpu.ops.cells import build_cell_engine
from sph_nca_tpu.ops.pallas.pair_kernel import fused_perception_pallas, perceive_cells
from sph_nca_tpu.models import SPHNCAConfig, init_params
from sph_nca_tpu.models.cell_step import rollout_cells
from sph_nca_tpu.utils.meshes import fibonacci_sphere

N = 102_400
x_np = fibonacci_sphere(N)
area = 4.0*np.pi*0.8**2/N
h = float(np.sqrt(30.0*area/np.pi))
eng = build_cell_engine(x_np, h)
print(f"C={eng.num_cells} M={eng.slots_per_cell} Wc={eng.win_cells.shape[1]}", flush=True)
cfg = SPHNCAConfig(normalize_perception=1.0/h)
params = init_params(jax.random.key(0), cfg)
S0 = eng.scatter(jax.random.uniform(jax.random.key(1), (N, 16)))

# single fused call
f = jax.jit(lambda e, S: fused_perception_pallas(e, S, use_alpha=True))
out = f(eng, S0); _ = np.asarray(out[0].ravel()[:1])
print("fused fwd compiled ok", flush=True)
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
print(f"fused perception: {(time.perf_counter()-t0-0.04)/R*1e3:.2f} ms", flush=True)

# full rollout
roll = jax.jit(lambda p, e, S, key: rollout_cells(p, cfg, e, S, key, 64, h, remat=False).final)
_ = np.asarray(roll(params, eng, S0, jax.random.key(2)).ravel()[:1])
t0=time.perf_counter(); _ = np.asarray(roll(params, eng, S0, jax.random.key(3)).ravel()[:1])
dt = time.perf_counter()-t0
print(f"64-step pallas rollout: {dt*1e3:.1f} ms -> {dt/64*1e3:.2f} ms/step -> {N*64/dt/1e6:.1f}M particle-steps/s")

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

# full rollout
from sph_nca_tpu.models.cell_step import rollout_cells
cfg = SPHNCAConfig(normalize_perception=1.0/h)
params = init_params(jax.random.key(0), cfg)
roll = jax.jit(lambda p, e, S, key: rollout_cells(p, cfg, e, S, key, 64, h, remat=False).final)
log("compiling rollout")
_ = np.asarray(roll(params, eng, S0, jax.random.key(2)).ravel()[:1])
t0=time.perf_counter(); _ = np.asarray(roll(params, eng, S0, jax.random.key(3)).ravel()[:1])
dt = time.perf_counter()-t0
log(f"64-step pallas rollout: {dt*1e3:.1f} ms -> {dt/64*1e3:.2f} ms/step -> {N*64/dt/1e6:.1f}M pps")
# training step (with backward)
import optax
from sph_nca_tpu.training import make_optimizer
opt = make_optimizer(3e-3)
ost = opt.init(params)
@jax.jit
def train_step(p, ost, e, S, key):
    def loss_fn(p):
        out = rollout_cells(p, cfg, e, S, key, 32, h, remat=True)
        return jnp.mean(out.final**2)
    l, g = jax.value_and_grad(loss_fn)(p)
    up, ost2 = opt.update(g, ost, p)
    return optax.apply_updates(p, up), ost2, l
log("compiling train step")
p2, o2, l = train_step(params, ost, eng, S0, jax.random.key(4)); _ = float(l)
t0=time.perf_counter(); p2, o2, l = train_step(params, ost, eng, S0, jax.random.key(5)); _ = float(l)
dt = time.perf_counter()-t0
log(f"32-step train step (fwd+bwd): {dt*1e3:.1f} ms -> {N*32/dt/1e6:.1f}M pps trained")

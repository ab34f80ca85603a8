"""A/B: the sampler-body pw_conv2 alternatives, at the serving shape.

serve_profile.json found the 50-step sampler's one sub-floor fusion is
pw_conv2 (90 TF/s, sol 0.46).  This probe measures a 20-eval scan of six
LYNX residual layers (B=16 x T=1024 x C=1024, bf16) in four arrangements:

  conv_k1            the shipped form (nn.Conv kernel_size=1)
  dot_general        explicit matmul with identical params/numerics
  barrier_after_ln   optimization_barrier splitting LN stats from the matmul
  barrier_after_pw2  optimization_barrier after pw_conv2

Measured on the v5e (2026-08-21): dot_general 0.857x, barriers 0.978-0.985x —
every alternative LOSES to XLA's k=1 conv emitter + layout choice.  Recorded
in serve_profile.json ab_runs; keep this probe so the next session can re-test
under a newer XLA instead of re-deriving the experiment.

Usage: python tools/perf_pw_conv_ab.py   (runs on whatever jax.devices() gives)
"""
import pathlib, sys, time, numpy as np
ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
from diffsinger_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax, jax.numpy as jnp
from flax import linen as nn
from diffsinger_tpu.models.commons import swiglu
from diffsinger_tpu.models.backbones.lynxnet import LYNXNet, PReLU

B, T, C, NM, H = 16, 1024, 1024, 128, 256
STEPS = 20

class PwDot(nn.Module):
    features: int
    dtype: object = None
    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(), (1, in_f, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        y = jax.lax.dot_general(x.astype(dt), kernel[0].astype(dt),
                                (((x.ndim - 1,), (0,)), ((), ())))
        return y + bias.astype(dt)

class ConvModB(nn.Module):
    dim: int; expansion_factor: int; kernel_size: int = 31
    dtype: object = None
    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.expansion_factor
        pad = self.kernel_size // 2
        padding = (pad, pad - (self.kernel_size + 1) % 2)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = PwDot(inner * 2, dtype=self.dtype, name="pw_conv1")(x)
        x = swiglu(x)
        x = nn.Conv(inner, kernel_size=(self.kernel_size,), padding=[padding],
                    feature_group_count=inner, dtype=self.dtype, name="dw_conv")(x)
        x = PReLU(inner, name="act")(x)
        x = PwDot(self.dim, dtype=self.dtype, name="pw_conv2")(x)
        return x

class LayerB(nn.Module):
    dim: int; expansion_factor: int
    dtype: object = None
    @nn.compact
    def __call__(self, x, cond_proj, step):
        res_x = x
        x = x + cond_proj
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="diffusion_projection")(step)[:, None, :]
        x = ConvModB(dim=self.dim, expansion_factor=self.expansion_factor,
                     dtype=self.dtype, name="convmodule")(x)
        return x + res_x

def run_variant(name, body_cls):
    net = body_cls()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(0, 1, (B, T, C)).astype(np.float32)).astype(jnp.bfloat16)
    cond = jnp.asarray(rng.normal(0, 1, (B, T, C)).astype(np.float32)).astype(jnp.bfloat16)
    step = jnp.asarray(rng.normal(0, 1, (B, C)).astype(np.float32)).astype(jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0), x0, cond, step)

    def scan_fn(p, x, cond, step):
        def body(carry, _):
            y = net.apply(p, carry, cond, step)
            return y, ()
        out, _ = jax.lax.scan(body, x, None, length=STEPS)
        return jnp.abs(out.astype(jnp.float32)).mean()

    f = jax.jit(scan_fn)
    t0 = time.time(); c = f.lower(params, x0, cond, step).compile(); print(f"{name} compile {time.time()-t0:.1f}s")
    for _ in range(2): float(c(params, x0, cond, step))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter(); float(c(params, x0, cond, step)); ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts)//2]
    print(f"{name}: {med*1e3:.1f} ms for {STEPS} evals of 6 layers -> {med*1e3/STEPS:.2f} ms/eval")
    return med

class SixA(nn.Module):
    @nn.compact
    def __call__(self, x, cond, step):
        from diffsinger_tpu.models.backbones.lynxnet import LYNXNetResidualLayer
        for i in range(6):
            x = LYNXNetResidualLayer(dim=C, expansion_factor=2, kernel_size=31,
                                     dtype=jnp.bfloat16, name=f"l{i}")(x, cond, step,
                                     True, cond_proj=cond)
        return x

class SixB(nn.Module):
    @nn.compact
    def __call__(self, x, cond, step):
        for i in range(6):
            x = LayerB(dim=C, expansion_factor=2, dtype=jnp.bfloat16, name=f"l{i}")(x, cond, step)
        return x

a = run_variant("conv_k1 ", SixA)
b = run_variant("dot_general", SixB)
print(f"speedup: {a/b:.3f}x")

class ConvModC(nn.Module):
    dim: int; expansion_factor: int; kernel_size: int = 31
    dtype: object = None
    barrier: str = "none"   # after_ln | after_pw2
    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.expansion_factor
        pad = self.kernel_size // 2
        padding = (pad, pad - (self.kernel_size + 1) % 2)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        if self.barrier == "after_ln":
            x = jax.lax.optimization_barrier(x)
        x = nn.Conv(inner * 2, kernel_size=(1,), dtype=self.dtype, name="pw_conv1")(x)
        x = swiglu(x)
        x = nn.Conv(inner, kernel_size=(self.kernel_size,), padding=[padding],
                    feature_group_count=inner, dtype=self.dtype, name="dw_conv")(x)
        x = PReLU(inner, name="act")(x)
        x = nn.Conv(self.dim, kernel_size=(1,), dtype=self.dtype, name="pw_conv2")(x)
        if self.barrier == "after_pw2":
            x = jax.lax.optimization_barrier(x)
        return x

class LayerC(nn.Module):
    dim: int; expansion_factor: int
    dtype: object = None
    barrier: str = "none"
    @nn.compact
    def __call__(self, x, cond_proj, step):
        res_x = x
        x = x + cond_proj
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="diffusion_projection")(step)[:, None, :]
        x = ConvModC(dim=self.dim, expansion_factor=self.expansion_factor,
                     dtype=self.dtype, barrier=self.barrier, name="convmodule")(x)
        return x + res_x

def make_sixc(barrier):
    class SixC(nn.Module):
        @nn.compact
        def __call__(self, x, cond, step):
            for i in range(6):
                x = LayerC(dim=C, expansion_factor=2, dtype=jnp.bfloat16,
                           barrier=barrier, name=f"l{i}")(x, cond, step)
            return x
    return SixC

for bar in ("after_ln", "after_pw2"):
    m = run_variant(f"barrier_{bar}", make_sixc(bar))
    print(f"vs conv_k1: {a/m:.3f}x")

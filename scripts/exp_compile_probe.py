"""Probe axon compile-time behavior: trivial jit, scan, static fori,
traced-bound fori (=while), nested scan-of-fori at bench scale."""
import os, tempfile, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", tempfile.mkdtemp())
import jax, jax.numpy as jnp

C, D, N = 1024, 32, 1000
x = jnp.ones((N, D)); y = jnp.ones((N,))


def vgrad(w):
    logits = w @ x.T
    val = jnp.sum(y * jax.nn.log_sigmoid(logits) - (1 - y) * jnp.log1p(jnp.exp(logits)), -1) - 0.5 * jnp.sum(w * w, -1)
    return val, jax.grad(lambda ww: jnp.sum(vgrad_val(ww)))(w)


def vgrad_val(w):
    logits = w @ x.T
    return jnp.sum(y * jax.nn.log_sigmoid(logits), -1) - 0.5 * jnp.sum(w * w, -1)


def vg(w):
    f = lambda ww: jnp.sum(vgrad_val(ww))
    return vgrad_val(w), jax.grad(f)(w)


def timeit(name, fn, *args):
    t0 = time.time()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)
    return out


w = jnp.zeros((C, D))

timeit("trivial", lambda w: w * 2 + 1, w)

def scan500(w):
    def body(c, _):
        v, g = vg(c)
        return c + 0.01 * g, v.mean()
    c, vs = jax.lax.scan(body, w, None, length=500)
    return c, vs
timeit("scan500 (grad inside)", scan500, w)

def scan_fori_static(w):
    def body(c, _):
        def leap(i, cc):
            v, g = vg(cc)
            return cc + 0.01 * g
        c = jax.lax.fori_loop(0, 32, leap, c)
        return c, c.mean()
    return jax.lax.scan(body, w, None, length=500)
timeit("scan500 x fori32-static", scan_fori_static, w)

def scan_fori_traced(w):
    def body(c, k):
        n = jax.random.randint(k, (), 1, 33)
        def leap(i, cc):
            v, g = vg(cc)
            return cc + 0.01 * g
        c = jax.lax.fori_loop(0, n, leap, c)
        return c, c.mean()
    return jax.lax.scan(body, w, jax.random.split(jax.random.PRNGKey(0), 500))
timeit("scan500 x fori32-traced (while)", scan_fori_traced, w)

def one_while(w):
    def cond(s):
        return s[1] < 32
    def step(s):
        c, i = s
        v, g = vg(c)
        return (c + 0.01 * g, i + 1)
    return jax.lax.while_loop(cond, step, (w, 0))
timeit("single while32", one_while, w)

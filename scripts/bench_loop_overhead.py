"""Measure TPU per-iteration overhead of fori_loop vs scan vs unroll for a
trivial body at the cloth state size."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timed(name, fn, x, iters, reps=50, trials=3):
    jfn = jax.jit(fn)
    float(jnp.sum(jfn(x)))
    best = 1e30
    for _ in range(trials):
        t0 = time.time()
        float(jnp.sum(jfn(x)))
        best = min(best, (time.time() - t0))
    print(json.dumps({"variant": name,
                      "us_per_iter": round(best * 1e6 / (reps * iters), 2)}),
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    x = jnp.ones((4992, 3), jnp.float32)
    IT = 50
    REPS = 50

    def body(p):
        return p + 1e-6 * p

    def outer(loop):
        def f(x):
            def rep(c, _):
                return loop(c), None
            c, _ = jax.lax.scan(rep, x, None, length=REPS)
            return c
        return f

    timed("fori_loop", outer(
        lambda p: jax.lax.fori_loop(0, IT, lambda i, c: body(c), p)), x, IT)

    def scan_loop(p):
        c, _ = jax.lax.scan(lambda c, _: (body(c), None), p, None, length=IT)
        return c
    timed("scan", outer(scan_loop), x, IT)

    def unrolled(p):
        for _ in range(IT):
            p = body(p)
        return p
    timed("unrolled", outer(unrolled), x, IT)

    def fori_unroll8(p):
        def b8(i, c):
            for _ in range(8):
                c = body(c)
            return c
        return jax.lax.fori_loop(0, IT // 8, b8, p)
    timed("fori unroll8 (48 it)", outer(fori_unroll8), x, IT)




def layouts():
    print("layout probe:", flush=True)
    for shape, name in [((4992, 3), "(N,3)"), ((3, 4992), "(3,N)"),
                        ((8, 4992), "(8,N)"), ((4992, 128), "(N,128)"),
                        ((39, 128, 3), "(39,128,3)")]:
        x = jnp.ones(shape, jnp.float32)
        IT, REPS = 50, 50

        def f(x):
            def rep(c, _):
                def body(i, c):
                    return c + 1e-6 * c
                return jax.lax.fori_loop(0, IT, body, c), None
            c, _ = jax.lax.scan(rep, x, None, length=REPS)
            return c
        jf = jax.jit(f)
        float(jnp.sum(jf(x)))
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            float(jnp.sum(jf(x)))
            best = min(best, time.time() - t0)
        print(json.dumps({"shape": name,
                          "us_per_iter": round(best * 1e6 / (REPS * IT), 2)}),
              flush=True)


if __name__ == "__main__":
    main()
    layouts()

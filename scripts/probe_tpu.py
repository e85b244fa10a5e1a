"""Tunnel health probe: compile+dispatch+fetch a trivial matmul.

Writes one line per phase to /tmp/probe_log.txt so a supervisor can
check both liveness and degradation (fetch seconds). Exit 0 iff the
full chain completed. Bound externally with `timeout`.
"""
import time

LOG = "/tmp/probe_log.txt"


def log(msg: str) -> None:
    with open(LOG, "a") as f:
        f.write(msg + "\n")
    print(msg, flush=True)


def main() -> None:
    open(LOG, "w").close()
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    log(f"import {time.time() - t0:.1f}s backend={jax.default_backend()}")
    t1 = time.time()
    x = jnp.ones((256, 256), jnp.bfloat16)
    y = jax.jit(lambda a: a @ a)(x)
    t2 = time.time()
    v = jax.device_get(y)
    t3 = time.time()
    log(f"compile+dispatch {t2 - t1:.1f}s")
    log(f"fetch {t3 - t2:.1f}s sum={float(v.astype('float32').sum()):.0f}")
    # steady-state RTT (post-D2H every dispatch pays the tunnel round trip)
    t4 = time.time()
    jax.device_get(jax.jit(lambda a: a @ a)(x))
    log(f"steady {time.time() - t4:.2f}s")


if __name__ == "__main__":
    main()

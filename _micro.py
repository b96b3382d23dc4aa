import time, jax, jax.numpy as jnp, numpy as np
N, E = 8192, 2
key = jax.random.PRNGKey(0)
fields = [jax.random.normal(key, (N,E)) for _ in range(32)]
dead = jax.random.bernoulli(key, 0.1, (N,E))

def timeit(name, fn, *args, reps=30):
    f = jax.jit(fn); out = f(*args); jax.block_until_ready(out)
    t=time.time()
    for _ in range(reps): out = f(*args)
    jax.block_until_ready(out)
    print(name, f"{(time.time()-t)/reps*1000:.3f} ms")

def argsort_only(dead):
    order = jnp.where(dead, E + jnp.arange(E), jnp.arange(E))
    return jnp.argsort(order, axis=-1)
timeit("argsort", argsort_only, dead)

def gathers(dead, *fs):
    perm = argsort_only(dead)
    return [jnp.take_along_axis(f, perm, axis=-1) for f in fs]
timeit("argsort+32 gathers", gathers, dead, *fields)

def cumsum_perm(dead):
    keep = ~dead
    n_alive = jnp.sum(keep, axis=-1, keepdims=True)
    pos_alive = jnp.cumsum(keep, axis=-1) - 1
    pos_dead = n_alive + jnp.cumsum(dead, axis=-1) - 1
    dest = jnp.where(keep, pos_alive, pos_dead)
    perm = jnp.zeros((N,E), jnp.int32)
    perm = jnp.take_along_axis(jnp.zeros((N,E),jnp.int32).at[jnp.arange(N)[:,None], dest].set(jnp.broadcast_to(jnp.arange(E),(N,E))), jnp.arange(E)[None,:].repeat(N,0), axis=-1)
    return perm
def cumsum_gathers(dead, *fs):
    perm = cumsum_perm(dead)
    return [jnp.take_along_axis(f, perm, axis=-1) for f in fs]
timeit("cumsum perm + 32 gathers", cumsum_gathers, dead, *fields)

def onehot_stack(dead, *fs):
    perm = cumsum_perm(dead)
    P = (jnp.arange(E)[None,None,:] == perm[:,:,None]).astype(jnp.float32)  # (N,E,E)
    X = jnp.stack(fs, axis=-1)  # (N,E,32)
    Y = jnp.einsum('nde,nef->ndf', P, X, preferred_element_type=jnp.float32)
    return [Y[...,i] for i in range(32)]
timeit("onehot stacked matmul", onehot_stack, dead, *fields)

def stack_gather(dead, *fs):
    order = jnp.where(dead, E + jnp.arange(E), jnp.arange(E))
    perm = jnp.argsort(order, axis=-1)
    X = jnp.stack(fs, axis=-1)
    Y = jnp.take_along_axis(X, perm[:,:,None], axis=1)
    return [Y[...,i] for i in range(32)]
timeit("argsort + stacked gather", stack_gather, dead, *fields)

"""Job 151: worker-r5f sanity — grant held, chip computes."""
x = jnp.ones((256, 256), jnp.bfloat16)
log(f"sanity matmul {fetch1(x @ x)}")
log("JOB OK")

"""Device kernels: RNG, camera ray gen, intersection, BRDF, texturing, tonemap."""

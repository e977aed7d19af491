"""Neural network modules (flax.linen): video UNet, KL-VAE, conditioning towers."""

"""Model families: language autoencoder, CogVideoX TriMap DiT, SAM2, VGGT."""

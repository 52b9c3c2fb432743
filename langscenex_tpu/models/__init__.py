"""Model families: language autoencoder, CogVideoX TriMap DiT, SAM1 (ViT-H proposals), SAM2 (video propagation), VGGT, LPIPS, T5, OpenSeg pooling."""

"""SAM2 video segmentation family: Hiera image encoder, prompt encoder,
mask decoder, streaming memory, video propagation, and SAM-style automatic
mask generation (reference: auto-seg/sam2/ vendored package)."""

"""Stage-2 auto-segmentation orchestration (TriMap seg keyframes)."""

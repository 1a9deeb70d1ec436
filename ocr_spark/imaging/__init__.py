"""Pure-numpy imaging kernels + minimal PNG codec (no cv2/PIL in this env)."""

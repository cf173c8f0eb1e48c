"""Shared utilities (rebuild of compare_gan/utils.py)."""

from compare_gan_tpu.utils.misc import (  # noqa: F401
    call_with_accepted_args,
    check_folder,
    gaussian,
    get_parameter_overview,
    image_grid,
    rotate_images,
    save_images,
)

"""Host-side file-level pipeline stages."""

from .cartesian import (  # noqa: F401
    aligned_inputs,
    convert_batch_aligned,
    convert_single_csv,
)
from .filtering import (  # noqa: F401
    find_files_by_range,
    find_targets,
    get_csv_range,
    remove_files_by_range,
)
from .sorting import (  # noqa: F401
    move_files_to_gain_folders,
    sniff_gain,
    sort_files_by_gain,
)

from .segments import combine_segments, segment_fold, segmented_scan_fold

__all__ = ["segment_fold", "segmented_scan_fold", "combine_segments"]

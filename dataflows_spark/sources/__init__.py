from .clips import clips_df, transcripts_side_df, write_clips_table

__all__ = ["clips_df", "transcripts_side_df", "write_clips_table"]

"""Command-line tools: bwt_merge, bwt_convert, bwt_inspect."""

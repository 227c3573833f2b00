"""End-to-end pipeline compositions (one continuous lazy lineage)."""

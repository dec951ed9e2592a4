"""Sources: pages-table IO and the synthetic fixture corpus."""

"""Sources: synthetic flagship `pages` table + /root/testdata readers."""

"""Sources: synthetic pages/frontier generators and testdata readers."""

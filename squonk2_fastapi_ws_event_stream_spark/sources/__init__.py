"""Sources: the custom "eventstream" DataSource and the registry table."""

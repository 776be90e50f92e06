"""``python -m entity_linking_in_biomedical_spark`` -> cli.main()."""

if __name__ == "__main__":
    import sys

    from .cli import main

    sys.exit(main())

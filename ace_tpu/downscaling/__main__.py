from ace_tpu.downscaling.train import main

if __name__ == "__main__":
    main()
